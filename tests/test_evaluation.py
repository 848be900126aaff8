"""Evaluator semantics (reference src/utils/evaluation.py)."""

import numpy as np
import pytest

from stlt_tpu.training.evaluation import (
    EvaluatorActionGenome,
    EvaluatorSomething,
    charades_map,
    mean_average_precision,
)


class TestSomething:
    def test_top1_top5_counts(self):
        ev = EvaluatorSomething(4, 10, ("stlt",))
        logits = np.zeros((4, 10))
        logits[0, 3] = 5.0  # top1 correct for label 3
        logits[1, 1] = 5.0
        logits[1, 7] = 4.0  # label 7 → in top5, not top1
        logits[2, 0] = 5.0  # label 9 not in top5 (rest zeros → ties; give distinct)
        logits[2, 1:6] = [4, 3, 2, 1, 0.5]
        logits[3, 2] = 5.0  # label 2 top1
        ev.process({"stlt": logits}, np.array([3, 7, 9, 2]))
        m = ev.evaluate()
        assert m["stlt_top1_accuracy"] == pytest.approx(2 / 4)
        assert m["stlt_top5_accuracy"] == pytest.approx(3 / 4)

    def test_valid_mask_excludes_padded_rows(self):
        ev = EvaluatorSomething(2, 6, ("stlt",))
        logits = np.zeros((4, 6))
        logits[np.arange(4), [1, 2, 3, 4]] = 1.0
        labels = np.array([1, 2, 3, 4])  # all "correct"
        ev.process({"stlt": logits}, labels, valid=np.array([True, True, False, False]))
        m = ev.evaluate()
        assert m["stlt_top1_accuracy"] == pytest.approx(1.0)  # 2 correct / 2 total

    def test_is_best_mean_of_all_metrics(self):
        ev = EvaluatorSomething(2, 6, ("stlt",))
        logits = np.zeros((2, 6))
        logits[0, 1] = 1.0
        ev.process({"stlt": logits}, np.array([1, 5]))
        assert ev.is_best()
        ev.reset()
        ev.process({"stlt": logits}, np.array([1, 5]))
        assert not ev.is_best()  # same score is not better


class TestCharadesMap:
    def test_perfect_predictions(self):
        gt = np.array([[1, 0], [0, 1], [1, 0]])
        m_ap, _, aps = mean_average_precision(gt.astype(float), gt)
        assert m_ap == pytest.approx(1.0)
        np.testing.assert_allclose(aps, [1.0, 1.0])

    def test_hand_computed_ap(self):
        # class 0: scores [.9, .8, .1], gt [1, 0, 1]
        # ranked: tp, fp, tp → prec at tps: 1/1, 2/3 → AP = (1 + 2/3)/2
        sub = np.array([[0.9], [0.8], [0.1]])
        gt = np.array([[1], [0], [1]])
        m_ap, _, _ = mean_average_precision(sub, gt)
        assert m_ap == pytest.approx((1 + 2 / 3) / 2)

    def test_empty_class_is_nan_and_propagates(self):
        # reference behavior: class with no positives → NaN AP → NaN mean
        sub = np.random.default_rng(0).random((4, 2))
        gt = np.zeros((4, 2))
        gt[:, 0] = [1, 0, 1, 0]
        m_ap, _, aps = mean_average_precision(sub, gt)
        assert np.isnan(aps[1]) and np.isnan(m_ap)

    def test_charades_fix_empty_rows(self):
        # row 1 has empty GT: its predictions get -inf → ranked last, so it
        # cannot poison precision for class 0
        sub = np.array([[0.5], [0.9], [0.4]])
        gt = np.array([[1], [0], [1]])
        m_ap_fixed, _, _ = charades_map(sub, gt)
        m_ap_raw, _, _ = mean_average_precision(sub, gt)
        assert m_ap_fixed == pytest.approx(1.0)  # both positives ranked 1, 2
        assert m_ap_raw < 1.0

    def test_evaluator_action_genome_stream(self):
        ev = EvaluatorActionGenome(4, 3, ("stlt",))
        rng = np.random.default_rng(1)
        logits = rng.normal(0, 1, (4, 3))
        labels = (rng.random((4, 3)) < 0.5).astype(np.float32)
        labels[0] = [1, 0, 0]  # ensure at least one positive
        ev.process({"stlt": logits[:2]}, labels[:2])
        ev.process({"stlt": logits[2:]}, labels[2:])
        m = ev.evaluate()
        probs = 1 / (1 + np.exp(-logits))
        expected, _, _ = charades_map(probs, labels)
        assert m["map"] == pytest.approx(expected)
