"""Detector train-side machinery (detection/training.py) vs oracles:
Matcher semantics incl. low-quality matches, sampler quotas, delta
round-trip, GIoU, and loss sanity (perfect predictions -> ~0)."""

import numpy as np

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.detection.boxes import apply_deltas, iou_matrix
from eventful_transformer_tpu.detection.training import (
    Matcher,
    fast_rcnn_losses,
    get_deltas,
    giou_loss,
    rpn_losses,
    sample_proposals,
    subsample_labels,
)


class TestMatcher:
    def test_buckets(self):
        # gt x anchors quality matrix with known best-IoU buckets
        quality = jnp.asarray([
            [0.1, 0.5, 0.8, 0.0],
            [0.2, 0.4, 0.1, 0.0],
        ])
        matcher = Matcher([0.3, 0.7], [0, -1, 1])
        matches, labels = matcher(quality)
        # best per anchor: 0.2, 0.5, 0.8, 0.0 -> neg, ignore, pos, neg
        np.testing.assert_array_equal(np.asarray(labels), [0, -1, 1, 0])
        np.testing.assert_array_equal(np.asarray(matches), [1, 0, 0, 0])

    def test_low_quality_matches(self):
        quality = jnp.asarray([
            [0.1, 0.5, 0.8, 0.0],
            [0.2, 0.4, 0.1, 0.0],
        ])
        matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
        _, labels = matcher(quality)
        # anchor 1 is gt-1's best (0.4) -> promoted to positive; anchor 2 is
        # gt-0's best (0.8, already positive); anchor 3 matches nothing
        np.testing.assert_array_equal(np.asarray(labels), [0, 1, 1, 0])

    def test_gt_mask_excludes_padding(self):
        quality = jnp.asarray([
            [0.9, 0.0],
            [0.0, 0.95],  # padded gt row
        ])
        matcher = Matcher([0.5], [0, 1], allow_low_quality_matches=True)
        _, labels = matcher(quality, gt_mask=jnp.asarray([True, False]))
        np.testing.assert_array_equal(np.asarray(labels), [1, 0])


class TestSampling:
    def test_quotas(self, rng):
        labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 20, jnp.int8)
        pos, neg = subsample_labels(jax.random.PRNGKey(0), labels, 32, 0.25)
        pos, neg = np.asarray(pos), np.asarray(neg)
        assert pos.sum() == 8  # min(10, 32 * 0.25)
        assert neg.sum() == 24  # 32 - 8
        assert not (pos & neg).any()
        assert pos[10:].sum() == 0 and neg[:10].sum() == 0 and neg[110:].sum() == 0

    def test_scarce_positives(self):
        labels = jnp.asarray([1] * 2 + [0] * 100, jnp.int8)
        pos, neg = subsample_labels(jax.random.PRNGKey(1), labels, 32, 0.5)
        assert int(np.asarray(pos).sum()) == 2
        assert int(np.asarray(neg).sum()) == 30


class TestBoxLosses:
    def test_delta_roundtrip(self, rng):
        src = jnp.asarray([[0.0, 0.0, 10.0, 20.0], [5.0, 5.0, 9.0, 30.0]])
        tgt = jnp.asarray([[1.0, 2.0, 12.0, 21.0], [4.0, 3.0, 11.0, 28.0]])
        weights = (10.0, 10.0, 5.0, 5.0)
        deltas = get_deltas(src, tgt, weights)
        back = apply_deltas(deltas, src, weights)
        np.testing.assert_allclose(np.asarray(back), np.asarray(tgt), rtol=1e-5, atol=1e-4)

    def test_giou(self):
        a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
        assert float(giou_loss(a, a)[0]) < 1e-6  # identical -> 0
        b = jnp.asarray([[4.0, 0.0, 6.0, 2.0]])  # disjoint, enclosing 6x2
        # iou 0, giou = -(12 - 8)/12 -> loss = 1 + 1/3
        np.testing.assert_allclose(float(giou_loss(a, b)[0]), 1 + 1 / 3, rtol=1e-5)


class TestRPNLosses:
    def test_perfect_predictions_near_zero_box_loss(self, rng):
        anchors = jnp.asarray(
            rng.uniform(0, 50, (64, 2)).repeat(2, axis=-1)
            + np.asarray([0, 0, 8, 8], np.float32)
        )
        gt = anchors[:3] + jnp.asarray([1.0, 1.0, 2.0, -1.0])
        gt_mask = jnp.ones((3,), bool)
        perfect = get_deltas(anchors, gt[jnp.argmax(iou_matrix(gt, anchors), axis=0)])
        logits = jnp.where(
            jnp.max(iou_matrix(gt, anchors), axis=0) > 0.3, 20.0, -20.0
        )
        losses = rpn_losses(
            jax.random.PRNGKey(0), anchors, logits, perfect, gt, gt_mask
        )
        assert float(losses["loss_rpn_loc"]) < 1e-5
        assert float(losses["loss_rpn_cls"]) < 0.01

    def test_wrong_predictions_positive_loss(self, rng):
        anchors = jnp.asarray(rng.uniform(0, 50, (32, 4)).astype(np.float32))
        anchors = jnp.concatenate([anchors[:, :2], anchors[:, :2] + 10], axis=-1)
        gt = anchors[:2]
        losses = rpn_losses(
            jax.random.PRNGKey(0),
            anchors,
            jnp.zeros((32,)),
            jnp.ones((32, 4)),
            gt,
            jnp.ones((2,), bool),
        )
        assert float(losses["loss_rpn_cls"]) > 0.05
        assert float(losses["loss_rpn_loc"]) > 0.0


class TestFastRCNNLosses:
    def test_sampling_and_losses(self, rng):
        proposals = jnp.asarray(rng.uniform(0, 40, (20, 2)).astype(np.float32))
        proposals = jnp.concatenate([proposals, proposals + 12], axis=-1)
        gt = proposals[:2] + 1.0
        gt_classes = jnp.asarray([3, 1], jnp.int32)
        gt_mask = jnp.ones((2,), bool)
        boxes, classes, sampled, matched = sample_proposals(
            jax.random.PRNGKey(0),
            proposals,
            jnp.ones((20,), bool),
            gt,
            gt_classes,
            gt_mask,
            num_classes=5,
        )
        assert boxes.shape == (22, 4)  # gt appended
        # the appended gt proposals match themselves -> their classes
        np.testing.assert_array_equal(np.asarray(classes[20:]), [3, 1])
        # perfect heads: one-hot scores at the matched class, exact boxes
        scores = 20.0 * jax.nn.one_hot(classes, 6)
        losses = fast_rcnn_losses(scores, matched, classes, sampled, matched, 5)
        assert float(losses["loss_cls"]) < 1e-3
        assert float(losses["loss_box_reg"]) < 1e-5

    def test_rpn_topk_train_test_pairs(self):
        from eventful_transformer_tpu.detection.rpn import RPN

        rpn = RPN(pre_nms_topk=(2000, 1000), post_nms_topk=(1000, 300))
        assert rpn.pre_nms_topk == (2000, 1000)
        assert RPN(pre_nms_topk=200).pre_nms_topk == (200, 200)
