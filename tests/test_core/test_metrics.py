"""Metric tests (mirrors reference tests/test_metrics.py:86-310 coverage)."""
import jax.numpy as jnp
import numpy as np

from s4former_tpu.core.metrics import (eval_metrics, intersect_and_union,
                                       mean_dice, mean_fscore, mean_iou,
                                       pre_eval_to_metrics,
                                       total_intersect_and_union)


def _rand_case(seed=0, n=19, shape=(30, 30)):
    rng = np.random.RandomState(seed)
    pred = rng.randint(0, n, shape)
    label = rng.randint(0, n, shape)
    label[:3, :3] = 255
    return pred, label, n


def _np_reference(pred, label, n, ignore=255):
    mask = label != ignore
    p, l = pred[mask], label[mask]
    inter = np.bincount(p[p == l], minlength=n)[:n]
    area_p = np.bincount(p, minlength=n)[:n]
    area_l = np.bincount(l, minlength=n)[:n]
    return inter, area_p + area_l - inter, area_p, area_l


def test_eval_metrics_match_reference_port():
    """eval_metrics (mIoU/mDice/mFscore) vs a literal numpy port of the
    reference (mmseg/core/evaluation/metrics.py: histogram totals,
    f_score with beta, NaN for absent classes)."""
    rng = np.random.RandomState(40)
    num_classes, ignore = 5, 255
    preds = [rng.randint(0, num_classes, (13, 17)) for _ in range(3)]
    gts = [rng.randint(0, num_classes, (13, 17)) for _ in range(3)]
    gts[0][:3] = ignore
    gts[1][..., :2] = 4

    ti = np.zeros(num_classes)
    tu = np.zeros(num_classes)
    tp = np.zeros(num_classes)
    tl = np.zeros(num_classes)
    for p, g in zip(preds, gts):
        mask = g != ignore
        pv, gv = p[mask], g[mask]
        inter = pv[pv == gv]
        ai = np.histogram(inter, bins=num_classes,
                          range=(0, num_classes - 1))[0]
        ap = np.histogram(pv, bins=num_classes,
                          range=(0, num_classes - 1))[0]
        al = np.histogram(gv, bins=num_classes,
                          range=(0, num_classes - 1))[0]
        ti += ai
        tp += ap
        tl += al
        tu += ap + al - ai
    with np.errstate(invalid='ignore', divide='ignore'):
        ref_iou = ti / tu
        ref_dice = 2 * ti / (tp + tl)
        prec = ti / tp
        rec = ti / tl
        beta = 1
        ref_f = (1 + beta ** 2) * prec * rec / (beta ** 2 * prec + rec)
        ref_acc = ti / tl
        ref_aacc = ti.sum() / tl.sum()

    from s4former_tpu.core.metrics import eval_metrics
    res = eval_metrics(preds, gts, num_classes, ignore_index=ignore,
                       metrics=['mIoU', 'mDice', 'mFscore'])
    np.testing.assert_allclose(res['IoU'], ref_iou, rtol=1e-6)
    np.testing.assert_allclose(res['Dice'], ref_dice, rtol=1e-6)
    np.testing.assert_allclose(res['Fscore'], ref_f, rtol=1e-6)
    np.testing.assert_allclose(res['Acc'], ref_acc, rtol=1e-6)
    np.testing.assert_allclose(res['aAcc'], ref_aacc, rtol=1e-6)


def test_intersect_and_union_matches_numpy():
    pred, label, n = _rand_case()
    ours = [np.asarray(x) for x in intersect_and_union(
        jnp.asarray(pred), jnp.asarray(label), n)]
    ref = _np_reference(pred, label, n)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


def test_total_and_pre_eval_consistent():
    cases = [_rand_case(s)[:2] for s in range(4)]
    n = 19
    preds = np.stack([c[0] for c in cases])
    labels = np.stack([c[1] for c in cases])
    ti, tu, tp, tl = total_intersect_and_union(
        jnp.asarray(preds), jnp.asarray(labels), n)
    per_image = [tuple(np.asarray(x) for x in intersect_and_union(
        jnp.asarray(p), jnp.asarray(l), n)) for p, l in cases]
    tables = pre_eval_to_metrics(per_image, ('mIoU',))
    direct = eval_metrics([c[0] for c in cases], [c[1] for c in cases], n)
    np.testing.assert_allclose(np.nanmean(tables['IoU']),
                               np.nanmean(direct['IoU']), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ti),
                                  sum(x[0] for x in per_image))


def test_perfect_prediction():
    label = np.tile(np.arange(5), (5, 5))[:, :5]
    m = mean_iou([label], [label], 5)
    assert np.nanmean(m['IoU']) == 1.0
    d = mean_dice([label], [label], 5)
    assert np.nanmean(d['Dice']) == 1.0
    f = mean_fscore([label], [label], 5)
    assert np.nanmean(f['Fscore']) == 1.0


def test_absent_class_is_nan():
    label = np.zeros((4, 4), np.int32)
    pred = np.zeros((4, 4), np.int32)
    m = mean_iou([pred], [label], num_classes=3)
    assert m['IoU'][0] == 1.0
    assert np.isnan(m['IoU'][1]) and np.isnan(m['IoU'][2])
