from unopose_tpu.models.unopose import UNOPose, compute_train_losses
from unopose_tpu.models.feature_extraction import ViTAE, ViTEncoderOneRef, get_chosen_pixel_feats
from unopose_tpu.models.embedding import GeometricStructureEmbedding, sinusoidal_embedding
from unopose_tpu.models.matching import CoarsePointMatching, FinePointMatching, FinePositionalEncoding
from unopose_tpu.models.transformer import GeometricTransformer, SparseToDenseTransformer
from unopose_tpu.models.vit import ViTPyramid, make_vit
