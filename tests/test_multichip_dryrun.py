"""Full-size multi-device dryrun (VERDICT r3 item 4).

Validates the PRODUCTION-shape sharded train step — 224px crops,
2048/5000-point clouds, the full main config — on a 2-device virtual CPU
mesh, via the same ``dryrun_multichip`` entry the driver exercises at tiny
shapes. The reference analogue is the multi-GPU train launch
(core/unopose/main_unopose.py:175-182). Slow (minutes of XLA CPU compile),
so it runs only under UNOPOSE_RUN_SLOW=1; ``dryrun_multichip`` isolates
itself in a clean subprocess, so the suite's already-initialized backend
does not interfere.
"""

import os.path as osp
import sys

import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_multichip_full_size():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2, full_size=True)
