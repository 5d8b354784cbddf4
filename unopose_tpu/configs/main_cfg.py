"""Default config — 1:1 counterpart of reference configs/main_cfg.py.

Same knob names and values; python dict-based (utils/config.CN) with dotted
CLI overrides instead of detectron2 LazyConfig.
"""

from __future__ import annotations

import os.path as osp

from unopose_tpu.utils.config import CN

PROJ_ROOT = osp.abspath(osp.join(osp.dirname(__file__), "../.."))

# reference configs/main_cfg.py:22-35
dataset_len = 2008971
train_batch_size_per_rank = 8
world_size = 4
train_batch_size = train_batch_size_per_rank * world_size
iters_per_epoch = dataset_len // train_batch_size
num_epoch = 3
max_iter = int(iters_per_epoch * num_epoch)
resample_times = 1


def get_cfg() -> CN:
    return CN(
        misc=dict(
            output_dir=osp.join(PROJ_ROOT, "output/main_cfg"),
            load_from="",
            exp_name="Pfoneref50",
            debug=False,
            train_batch_size=train_batch_size,
            world_size=world_size,
        ),
        train=dict(
            max_iter=max_iter,
            resample_times=resample_times,
            eval_period=max_iter,
            checkpointer=dict(period=5000, max_to_keep=2),
            clip_grad=dict(enabled=False, params=dict(max_norm=35, norm_type=2)),
            seed=1,
            log_period=50,
            vis_img_tbx=False,  # periodic input-crop images to TensorBoard
            amp=dict(enabled=False),
            amp_dtype="bfloat16",
            backbone_dtype="bfloat16",  # frozen ViT runs bf16 on TPU
            matcher_dtype="float32",
        ),
        test=dict(
            save_results_only=False,
            oneref_type="v1",
            instance_batch_size=16,
            vis=False,
            # cache per-reference template features (dense_po/dense_fo/LRF)
            # across chunks/images — the cross-scene rot50 map reuses refs
            template_cache=True,
        ),
        optimizer=dict(
            type="adam",
            lr=1e-4,
            betas=(0.5, 0.999),
            weight_decay=0.0,
            eps=1e-6,
        ),
        lr_multiplier=dict(
            warmup_method="linear",
            warmup_factor=0.001,
            warmup_iters=1000,
            total_iters=max_iter,
            anneal_point=min(1000 / max_iter, 1.0),
            anneal_method="cosine",
            target_lr_factor=0.0,
        ),
        model=dict(
            coarse_npoint=196,
            fine_npoint=2048,
            feature_extraction=dict(
                vit_type="vit_base_patch14_reg4_dinov2",
                # W8A8 ViT block GEMMs at inference (~2x MXU rate on v5e).
                # Accuracy gate: the 104-pair full-model study shows int8
                # deltas indistinguishable from bf16 rounding at every
                # deterministic tap (coarse atten rel 0.61% vs 0.52% max,
                # same fine-score distribution — benchmarks/SUBSET_STUDY.md)
                int8_gemm=True,
                up_type="linear",
                embed_dim=768,
                out_dim=256,
                use_pyramid_feat=True,
                pretrained=True,
                vit_ckpt=osp.join(PROJ_ROOT, "checkpoints/timm_vit_base_patch14_reg4_dinov2_lvd142m.pth"),
                freeze_vit=True,
                img_size=224,
            ),
            geo_embedding=dict(
                sigma_d=0.2,
                sigma_a=15,
                angle_k=3,
                reduction_a="max",
                hidden_dim=256,
                # TPU extension: fused Pallas RPE kernel table size (0 = off);
                # inference-only, auto-gated on backend inside the module
                fused_table=128,
                # int8 embedding storage (halves HBM traffic of the largest
                # forward tensor; quant step ~bf16 rounding — see geo_fused)
                quant_int8=True,
            ),
            coarse_point_matching=dict(
                nblock=3,
                input_dim=256,
                hidden_dim=256,
                out_dim=256,
                temp=0.1,
                sim_type="cosine",
                normalize_feat=True,
                loss_predator_thres=0.15,
                loss_dis_thres=0.3,
                nproposal1=6000,
                nproposal2=300,
            ),
            fine_point_matching=dict(
                nblock=3,
                input_dim=256,
                hidden_dim=256,
                out_dim=256,
                pe_radius1=0.1,
                pe_radius2=0.2,
                focusing_factor=3,
                temp=0.1,
                sim_type="cosine",
                normalize_feat=True,
                loss_predator_thres=0.15,
                loss_dis_thres=0.3,
                use_lrf=True,
                use_xyz=True,
                nsample1=64,
                nsample2=256,
                # exact reference ball-query semantics — the ONE config used
                # for both the benchmark and checkpoint parity (see
                # benchmarks/SUBSET_STUDY.md)
                pe_neighbor_mode="first_k",
            ),
        ),
        dataloader=dict(
            train=dict(
                data_dir=osp.join(PROJ_ROOT, "datasets/MegaPose-Training-Data"),
                img_size=224,
                n_sample_observed_point=2048,
                n_sample_model_point=2048,
                n_sample_template_point=5000,
                min_visib_fract=0.1,
                min_px_count_visib=512,
                shift_range=0.01,
                rgb_mask_flag=True,
                dilate_mask=True,
                rgb_to_bgr=False,
                num_img_per_epoch=(max_iter // resample_times) * train_batch_size,
                total_batch_size=train_batch_size,
                num_workers=8,
            ),
            test=dict(
                data_dir=osp.join(PROJ_ROOT, "datasets/BOP_DATASETS"),
                ref_targets_name="test_ref_targets_crossscene_rot50.json",
                img_size=224,
                n_sample_observed_point=2048,
                n_sample_model_point=1024,
                n_sample_template_point=5000,
                minimum_n_point=8,
                rgb_mask_flag=True,
                seg_filter_score=0.25,
                rgb_to_bgr=False,
                eval_dataset_name="ycbv",
                detection_path=osp.join(
                    PROJ_ROOT,
                    "datasets/segmentation/CustomSamAutomaticMaskGenerator_test_oneref_targets_crossscene_rot50_refvisib_ycbv.json",
                ),
                num_workers=4,
            ),
        ),
        bop_eval=dict(split="test"),
    )


def get_tiny_cfg(img_size: int = 28, n_pts: int = 64, coarse_npoint: int = 16, n_tem: int = 96) -> CN:
    """A shrunken config for CPU tests and the multi-chip dry run: tiny ViT,
    small point budgets, same architecture topology."""
    cfg = get_cfg()
    cfg.model.coarse_npoint = coarse_npoint
    cfg.model.fine_npoint = n_pts
    cfg.model.feature_extraction.merge(
        dict(vit_type="vit_tiny_test", embed_dim=32, out_dim=32, img_size=img_size, pretrained=False)
    )
    cfg.model.geo_embedding.hidden_dim = 32
    for k in ("coarse_point_matching", "fine_point_matching"):
        cfg.model[k].merge(dict(input_dim=32, hidden_dim=32, out_dim=32))
    cfg.model.coarse_point_matching.merge(dict(nproposal1=100, nproposal2=20))
    cfg.model.fine_point_matching.merge(dict(nsample1=8, nsample2=16))
    cfg.dataloader.train.merge(
        dict(
            img_size=img_size,
            n_sample_observed_point=n_pts,
            n_sample_template_point=n_tem,
        )
    )
    return cfg
