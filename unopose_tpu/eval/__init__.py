from unopose_tpu.eval.pose_error import add, adi, mspd, mssd, vsd_from_depths
from unopose_tpu.eval.bop_eval import evaluate_bop
