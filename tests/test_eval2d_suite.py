"""Evaluator family (panoptic/instance/retrieval/grounding/captioning/
classification/interactive) — hand-computed metric pins, plus the dataset
registry dispatch. Rebuild coverage for the reference's
datasets/evaluation/*.py."""

import numpy as np
import pytest

from geopurify_tpu.utils.eval2d_suite import (
    CaptioningEvaluator,
    ClassificationEvaluator,
    GroundingEvaluator,
    InstanceEvaluator,
    InteractiveEvaluator,
    PanopticEvaluator,
    RetrievalEvaluator,
    bleu4,
)


def test_grounding_metrics_hand_computed():
    ev = GroundingEvaluator()
    H = W = 10
    gt = np.zeros((2, H, W), bool)
    gt[0, :5] = True            # 50 px
    gt[1, :, :4] = True         # 40 px
    pred = np.zeros((2, H, W), bool)
    pred[0, :5] = True          # perfect -> IoU 1.0
    pred[1, :, :2] = True
    pred[1, 0, 3] = True        # 21 inter / 40 union -> IoU 0.525
    ev.process(pred, gt)
    r = ev.evaluate()
    assert r["mIoU"] == pytest.approx(100 * (1.0 + 21 / 40) / 2, abs=0.1)
    assert r["cIoU"] == pytest.approx(100 * (50 + 21) / (50 + 40), abs=0.1)
    # note the reference's IoU = I/(U + 1e-6): an exact-0.5 IoU lands just
    # UNDER the 0.5 threshold — faithfully reproduced
    assert r["precision@0.5"] == 100.0
    assert r["precision@0.6"] == 50.0


def test_interactive_noc():
    ev = InteractiveEvaluator(max_clicks=5, iou_iter=2)
    ev.process([
        np.array([0.3, 0.6, 0.9, 0.95, 0.95]),   # reaches 0.85 at click 3
        np.array([0.1, 0.2, 0.3, 0.4, 0.5]),     # never reaches 0.85
    ])
    r = ev.evaluate()
    assert r["noc@0.85"] == pytest.approx((3 + 5) / 2)
    assert r["noc@0.5"] == pytest.approx((2 + 5) / 2)
    assert r["miou@iter2"] == pytest.approx((0.6 + 0.2) / 2)


def test_retrieval_recall():
    ev = RetrievalEvaluator()
    # 3 images, one caption each, embeddings constructed so image0's caption
    # ranks image1 first (one retrieval miss each way for image0/1)
    e = np.eye(4)
    ev.process(0, e[0], [0], e[1][None])
    ev.process(1, e[1], [1], e[0][None])
    ev.process(2, e[2], [2], e[2][None])
    r = ev.evaluate()
    assert r["ir1"] == pytest.approx(100 / 3, abs=0.01)
    assert r["tr1"] == pytest.approx(100 / 3, abs=0.01)
    assert r["ir5"] == 100.0 and r["tr5"] == 100.0


def test_classification_topk():
    ev = ClassificationEvaluator()
    logits = np.zeros((4, 10))
    logits[0, 3] = 5            # correct top1
    logits[1, 0] = 5; logits[1, 7] = 4   # label 7 in top5
    logits[2, 1] = 5            # label 9 not in top5 (others zero ties...)
    logits[2, [1, 2, 3, 4, 5]] = [5, 4, 3, 2, 1]
    logits[3, 2] = 5
    ev.process(logits, np.array([3, 7, 9, 2]))
    r = ev.evaluate()
    assert r["top1"] == pytest.approx(50.0)
    assert r["top5"] == pytest.approx(75.0)


def test_bleu4_sanity():
    assert bleu4(["the cat sat on the mat"], [["the cat sat on the mat"]]) == \
        pytest.approx(1.0)
    low = bleu4(["a b c d e"], [["v w x y z"]])
    assert low == 0.0
    mid = bleu4(
        ["the cat sat on the mat today"],
        [["the cat sat on the mat"]],
    )
    assert 0.0 < mid < 1.0


def test_panoptic_pq_hand_computed():
    ev = PanopticEvaluator(void_label=-1)
    H = W = 10
    gt = np.full((H, W), -1)
    gt[:5] = 1                  # segment 1, class 0 (50 px)
    gt[5:, :5] = 2              # segment 2, class 1 (25 px)
    pred = np.zeros((H, W))
    pred[:5] = 11               # matches gt 1 exactly -> IoU 1.0
    pred[5:, :5] = 12           # matches gt 2 exactly
    pred[5:, 5:] = 13           # entirely over VOID -> ignored, not FP
    ev.process(pred, {11: 0, 12: 1, 13: 2}, gt, {1: 0, 2: 1})
    r = ev.evaluate()
    assert r["PQ"] == pytest.approx(100.0)
    assert r["SQ"] == pytest.approx(100.0)
    assert r["RQ"] == pytest.approx(100.0)

    # an unmatched gt (FN) halves RQ for its class
    ev2 = PanopticEvaluator(void_label=-1)
    gt2 = np.full((H, W), -1)
    gt2[:5] = 1
    gt2[5:] = 2                 # class 0 again, unmatched
    pred2 = np.full((H, W), 99)
    pred2[:5] = 11
    pred2[5:] = 11              # one big pred segment class 0: IoU vs gt1 = 0.5 -> no match at >0.5
    ev2.process(pred2, {11: 0}, gt2, {1: 0, 2: 0})
    r2 = ev2.evaluate()
    assert r2["PQ"] == 0.0      # no TP at IoU > 0.5


def test_instance_ap_hand_computed():
    ev = InstanceEvaluator(num_classes=2)
    H = W = 10
    gt = np.zeros((2, H, W), bool)
    gt[0, :5] = True
    gt[1, 5:] = True
    pred = np.zeros((3, H, W), bool)
    pred[0, :5] = True          # perfect match, class 0, score .9
    pred[1, 5:] = True          # perfect match, class 1, score .8
    pred[2, :2] = True          # duplicate/partial class 0, score .7 -> FP
    ev.process(pred, [0, 1, 0], [0.9, 0.8, 0.7], gt, [0, 1])
    r = ev.evaluate()
    # class 0: TP at rank1, FP at rank2 -> AP = 1.0 at every threshold
    # (precision stays 1.0 at all recall points up to 1.0)
    assert r["AP50"] == pytest.approx(100.0)
    assert r["AP"] == pytest.approx(100.0)

    # a miss: gt with no matching pred halves recall for that class
    ev2 = InstanceEvaluator(num_classes=1)
    gt2 = np.zeros((2, H, W), bool)
    gt2[0, :5] = True
    gt2[1, 5:] = True
    pred2 = gt2[:1]
    ev2.process(pred2, [0], [0.9], gt2, [0, 0])
    r2 = ev2.evaluate()
    # recall caps at 0.5 -> 101-pt AP ~ 51/101
    assert r2["AP50"] == pytest.approx(100 * 51 / 101, abs=0.5)


def test_registry_dispatch():
    from geopurify_tpu.data import registry

    names = registry.list_datasets()
    assert "geopurify_scannet" in names
    meta = registry.metadata("geopurify_scannet")
    assert meta.evaluator_type == "sem_seg"
    assert len(meta.class_names) >= 19
    assert meta.extra["foreground_category"]

    ev = registry.build_evaluator("grounding")
    assert isinstance(ev, GroundingEvaluator)
    ev2 = registry.build_evaluator("instance", num_classes=3)
    assert isinstance(ev2, InstanceEvaluator)
    ev3 = registry.build_evaluator(
        "geopurify_scannet", num_classes=19
    )
    from geopurify_tpu.utils.eval2d import SemSeg2DEvaluator

    assert isinstance(ev3, SemSeg2DEvaluator)
