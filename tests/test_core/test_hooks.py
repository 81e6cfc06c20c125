"""Logging hook tests (JSONL scalars + eval image table)."""
import json
import os

import numpy as np

from s4former_tpu.core.hooks import JsonlLoggerHook


def test_jsonl_scalars(tmp_path):
    hook = JsonlLoggerHook(str(tmp_path))
    hook.log(10, {'loss': 1.5, 'lr': 0.001})
    hook.log(20, {'mIoU': 0.7}, prefix='val')
    lines = [json.loads(line) for line in
             open(tmp_path / 'metrics.jsonl')]
    assert lines[0]['step'] == 10 and lines[0]['loss'] == 1.5
    assert lines[1]['prefix'] == 'val' and lines[1]['mIoU'] == 0.7


def test_eval_image_table(tmp_path):
    """Val-table logging (reference MMSegWandbHook wandblogger_hook.py:
    199-317): side-by-side panels written per eval."""
    hook = JsonlLoggerHook(str(tmp_path))
    rng = np.random.RandomState(0)
    imgs = [rng.randn(16, 16, 3) for _ in range(3)]
    preds = [rng.randint(0, 5, (16, 16)) for _ in range(3)]
    gts = [rng.randint(0, 5, (16, 16)) for _ in range(3)]
    gts[0][0, 0] = 255  # ignore pixels must not crash the palette
    out = hook.log_eval_images(100, imgs, preds, gts,
                               palette=[[0, 0, 0], [255, 0, 0],
                                        [0, 255, 0], [0, 0, 255],
                                        [255, 255, 0]], max_images=2)
    files = sorted(os.listdir(out))
    assert files == ['000.png', '001.png']
    from PIL import Image
    panel = np.asarray(Image.open(os.path.join(out, files[0])))
    assert panel.shape == (16, 48, 3)  # image | gt | pred
