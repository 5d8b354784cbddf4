"""Evaluator scalability profile (VERDICT round-1 item 9).

Builds an enlarged synthetic BOP fixture (default 60 images, 2 objects,
multiple GT instances and 3-4 estimates per object per image), runs
evaluate_bop, and attributes wall clock to the depth renderer vs the python
matching loops. Prints one JSON line. The evaluator must be renderer-bound:
python loop overhead is the fixed cost that used to scale O(images x
targets) before the target pre-index + per-GT render cache."""

import json
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

K = np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float64)


def cube_mesh(size):
    s = size / 2
    pts = np.array(
        [[-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s], [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s]],
        np.float32,
    )
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
         [3, 2, 6], [3, 6, 7], [0, 3, 7], [0, 7, 4], [1, 5, 6], [1, 6, 2]], np.int32,
    )
    return pts, faces


def build_fixture(root, n_images=60):
    import imageio.v2 as imageio

    from unopose_tpu.eval.renderer import MeshRasterRenderer

    rng = np.random.default_rng(0)
    models = osp.join(root, "models_eval")
    os.makedirs(models)
    rend = MeshRasterRenderer(480, 640)
    info = {}
    for oid, size in ((1, 60.0), (2, 40.0)):
        pts, faces = cube_mesh(size)
        with open(osp.join(models, f"obj_{oid:06d}.ply"), "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\nproperty float x\nproperty float y\nproperty float z\n")
            f.write(f"element face {len(faces)}\nproperty list uchar int vertex_indices\nend_header\n")
            for v in pts:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
            for fc in faces:
                f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
        diam = float(np.linalg.norm(pts[0] - pts[6]))
        info[str(oid)] = {"diameter": diam}
        rend.add_object(oid, pts, faces, diam)
    json.dump(info, open(osp.join(models, "models_info.json"), "w"))

    scene = osp.join(root, "test", "000001")
    os.makedirs(osp.join(scene, "depth"))
    gts, infos, cams, targets, rows = {}, {}, {}, [], []
    for im in range(1, n_images + 1):
        im_gts, im_infos = [], []
        depth = np.zeros((480, 640), np.float64)
        for oid in (1, 2):
            n_inst = int(rng.integers(1, 3))
            targets.append(dict(scene_id=1, im_id=im, obj_id=oid, inst_count=n_inst))
            for k in range(n_inst):
                R = np.eye(3)
                t = np.array([rng.uniform(-80, 80), rng.uniform(-60, 60), rng.uniform(620, 760)])
                d = MeshRasterRenderer(480, 640)  # render via shared rend below
                d = rend.render_depth(oid, R, t, K)
                m = d > 0
                depth[m] = np.where(depth[m] > 0, np.minimum(depth[m], d[m]), d[m])
                im_gts.append(dict(obj_id=oid, cam_R_m2c=R.reshape(-1).tolist(), cam_t_m2c=t.tolist()))
                im_infos.append(dict(visib_fract=float(rng.uniform(0.5, 1.0))))
                # 2 estimates per GT: one near-perfect, one noisy
                for dt, sc in (([0, 0, rng.uniform(0, 3)], 0.9), ([rng.uniform(10, 40), 0, 0], 0.4)):
                    rows.append(
                        f"1,{im},{oid},{sc + rng.uniform(0, 0.05):.4f},"
                        + " ".join(str(v) for v in R.reshape(-1))
                        + ","
                        + " ".join(str(v) for v in (t + dt))
                        + ",1.0"
                    )
        imageio.imwrite(osp.join(scene, "depth", f"{im:06d}.png"), np.round(depth).astype(np.uint16))
        gts[str(im)] = im_gts
        infos[str(im)] = im_infos
        cams[str(im)] = dict(cam_K=K.reshape(-1).tolist(), depth_scale=1.0)
    json.dump(gts, open(osp.join(scene, "scene_gt.json"), "w"))
    json.dump(infos, open(osp.join(scene, "scene_gt_info.json"), "w"))
    json.dump(cams, open(osp.join(scene, "scene_camera.json"), "w"))
    json.dump(targets, open(osp.join(root, "test_targets_bop19.json"), "w"))
    csv = osp.join(root, "est.csv")
    open(csv, "w").write("\n".join(rows) + "\n")
    return csv


def main(n_images=60):
    from unopose_tpu.eval import renderer as renderer_mod
    from unopose_tpu.eval.bop_eval import evaluate_bop

    render_time = [0.0]
    orig = renderer_mod.MeshRasterRenderer.render_depth

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        render_time[0] += time.perf_counter() - t0
        return out

    with tempfile.TemporaryDirectory() as root:
        csv = build_fixture(root, n_images)
        renderer_mod.MeshRasterRenderer.render_depth = timed
        try:
            t0 = time.perf_counter()
            res = evaluate_bop(csv, root)
            total = time.perf_counter() - t0
        finally:
            renderer_mod.MeshRasterRenderer.render_depth = orig
    out = {
        "metric": "eval_wall_seconds",
        "n_images": n_images,
        "total_s": round(total, 3),
        "renderer_s": round(render_time[0], 3),
        "renderer_frac": round(render_time[0] / total, 3),
        "AR": round(res["AR"], 4),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
