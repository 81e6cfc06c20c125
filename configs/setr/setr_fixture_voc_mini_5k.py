# Long-horizon fixture run: the scaled version of the reference's 80k
# contract (mmseg/apis/train.py:70-269) at a 5k-iter budget — eval every
# 500 iters (>=10 eval points), periodic checkpoints, and the driver
# script kills the process twice mid-run to exercise --auto-resume
# (utils/misc.py:7-41 find_latest_checkpoint semantics); both resume
# seams must be invisible in the loss curve (docs/runs/fixture_r4).
_base_ = ['./setr_fixture_voc_mini_fullflag.py']

runner = dict(max_iters=5001)
evaluation = dict(interval=500, metric='mIoU', pre_eval=True)
checkpoint_config = dict(by_epoch=False, interval=500)
log_config = dict(interval=25)
