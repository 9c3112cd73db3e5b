"""Detection stack tests: NMS vs a numpy oracle, box transforms and conv ops
vs torch, ROIAlign sanity, and end-to-end tiny ViTDet (dense + eventful)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.detection.anchors import cell_anchors, grid_anchors
from eventful_transformer_tpu.detection.boxes import apply_deltas, iou_matrix
from eventful_transformer_tpu.detection.nms import batched_nms, nms_padded
from eventful_transformer_tpu.detection.roi_align import assign_levels, roi_align
from eventful_transformer_tpu.models.vitdet import ViTDet


def _nms_oracle(boxes, scores, thresh):
    """Straightforward numpy greedy NMS."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + area - inter, 1e-9)
        suppressed |= iou > thresh
    return keep


class TestNMS:
    def test_matches_numpy_oracle(self, rng):
        boxes = np.abs(rng.standard_normal((64, 2)) * 20)
        boxes = np.concatenate([boxes, boxes + 5 + np.abs(rng.standard_normal((64, 2)) * 15)], 1)
        boxes = boxes.astype(np.float32)
        scores = rng.standard_normal(64).astype(np.float32)
        idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 32)
        got = np.asarray(idx)[np.asarray(mask)].tolist()
        want = _nms_oracle(boxes, scores, 0.5)[:32]
        assert got == want

    def test_padded_invalid_scores(self, rng):
        boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (8, 1))
        scores = np.full(8, -np.inf, np.float32)
        scores[3] = 1.0
        idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 4)
        assert np.asarray(mask).sum() == 1
        assert int(np.asarray(idx)[0]) == 3

    def test_blocked_matches_numpy_oracle(self, rng):
        """n > _BLOCK takes the blocked kept-set path (detection/nms.py);
        must agree with greedy exactly through the full output capacity."""
        n = 2500  # 3 blocks at _BLOCK=1024, last one ragged
        centers = np.abs(rng.standard_normal((n, 2)) * 40)
        sizes = 2 + np.abs(rng.standard_normal((n, 2)) * 12)
        boxes = np.concatenate([centers, centers + sizes], 1).astype(np.float32)
        scores = rng.standard_normal(n).astype(np.float32)
        scores[::7] = -np.inf  # invalid candidates interleaved
        for max_out in (16, 300):
            idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out)
            got = np.asarray(idx)[np.asarray(mask)].tolist()
            want = _nms_oracle(boxes, scores, 0.5)[:max_out]
            assert got == want

    def test_blocked_capacity_overflow(self, rng):
        """More keeps than max_out: the first max_out (score order) are
        returned and the mask saturates."""
        n = 1100  # > _BLOCK, disjoint boxes -> everything valid is kept
        x = np.arange(n, dtype=np.float32) * 20
        boxes = np.stack([x, x * 0, x + 10, x * 0 + 10], 1)
        scores = rng.standard_normal(n).astype(np.float32)
        idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64)
        assert np.asarray(mask).all()
        np.testing.assert_array_equal(
            np.asarray(idx), np.argsort(-scores)[:64]
        )

    def test_batched_groups_dont_suppress(self):
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        groups = np.array([0, 1], np.int32)
        _, mask = batched_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(groups), 0.5, 4
        )
        assert np.asarray(mask).sum() == 2  # identical boxes, different groups


class TestBoxes:
    def test_apply_deltas_matches_torch_semantics(self, rng):
        boxes = np.array([[10, 20, 50, 80]], np.float32)
        deltas = np.array([[0.1, -0.2, 0.3, 0.05]], np.float32)
        got = np.asarray(apply_deltas(jnp.asarray(deltas), jnp.asarray(boxes), (10, 10, 5, 5)))
        w, h = 40.0, 60.0
        cx, cy = 30.0, 50.0
        ncx = cx + 0.01 * w
        ncy = cy - 0.02 * h
        nw = w * np.exp(0.06)
        nh = h * np.exp(0.01)
        want = [ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2]
        np.testing.assert_allclose(got[0], want, rtol=1e-5)

    def test_iou_matrix(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
        iou = np.asarray(iou_matrix(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-5)


class TestAnchors:
    def test_cell_anchor_areas_and_ratios(self):
        anchors = cell_anchors([32], [0.5, 1.0, 2.0])
        w = anchors[:, 2] - anchors[:, 0]
        h = anchors[:, 3] - anchors[:, 1]
        np.testing.assert_allclose(w * h, [1024] * 3, rtol=1e-5)
        np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)

    def test_grid_layout(self):
        anchors = grid_anchors((2, 3), 16, [32], [1.0])
        assert anchors.shape == (6, 4)
        # second anchor is the (y=0, x=1) cell, shifted by one stride in x
        np.testing.assert_allclose(anchors[1] - anchors[0], [16, 0, 16, 0])
        # row stride: anchor (y=1, x=0) shifted by one stride in y
        np.testing.assert_allclose(anchors[3] - anchors[0], [0, 16, 0, 16])


class TestROIAlign:
    def test_constant_map(self):
        fm = jnp.ones((16, 16, 3), jnp.float32) * 7.0
        boxes = jnp.asarray([[8, 8, 40, 40]], jnp.float32)  # image coords, scale 1/4
        out = roi_align(fm, boxes, 0.25, output_size=7, sampling_ratio=2)
        np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-6)

    def test_linear_gradient_center(self):
        # f(y, x) = x: pooled bin centers must reproduce x exactly under
        # bilinear interpolation of a linear function.
        x_ramp = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32)[None, :, None], (32, 32, 1))
        boxes = jnp.asarray([[4, 4, 20, 20]], jnp.float32)  # scale 1.0
        out = np.asarray(roi_align(x_ramp, boxes, 1.0, output_size=4, sampling_ratio=2))
        # continuous coords: x1 = 4 - 0.5 = 3.5, bin width 4 -> centers at 5.5, 9.5, ...
        np.testing.assert_allclose(out[0, 0, :, 0], [5.5, 9.5, 13.5, 17.5], rtol=1e-5)

    def test_level_assignment(self):
        boxes = jnp.asarray(
            [[0, 0, 56, 56], [0, 0, 112, 112], [0, 0, 224, 224], [0, 0, 448, 448],
             [0, 0, 1000, 1000]],
            jnp.float32,
        )
        levels = np.asarray(assign_levels(boxes, 2, 5))
        np.testing.assert_array_equal(levels, [2, 3, 4, 5, 5])


class TestConvOps:
    def test_conv2d_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((1, 5, 9, 9)).astype(np.float32)
        w = rng.standard_normal((4, 5, 3, 3)).astype(np.float32)
        b = rng.standard_normal(4).astype(np.float32)
        want = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1
        ).numpy()
        from eventful_transformer_tpu.ops.conv import conv2d

        got = conv2d(
            jnp.asarray(np.moveaxis(x, 1, -1)),
            jnp.asarray(w.transpose(2, 3, 1, 0)),
            jnp.asarray(b),
            padding=1,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(got), -1, 1), want, rtol=1e-4, atol=1e-5
        )

    def test_conv_transpose_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((1, 6, 4, 4)).astype(np.float32)
        w = rng.standard_normal((6, 3, 2, 2)).astype(np.float32)  # torch (Cin, Cout, kh, kw) -> ours (kh, kw, Cout, Cin)
        b = rng.standard_normal(3).astype(np.float32)
        want = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=2
        ).numpy()
        from eventful_transformer_tpu.ops.conv import conv_transpose2d

        got = conv_transpose2d(
            jnp.asarray(np.moveaxis(x, 1, -1)),
            jnp.asarray(w.transpose(2, 3, 1, 0)),
            jnp.asarray(b),
            stride=2,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(got), -1, 1), want, rtol=1e-4, atol=1e-5
        )


TINY_VITDET = dict(
    classes=5,
    input_shape=[3, 64, 64],
    normalize_mean=[123.675, 116.28, 103.53],
    normalize_std=[58.395, 57.12, 57.375],
    output_channels=32,
    patch_size=[16, 16],
    scale_factors=[4.0, 2.0, 1.0, 0.5],
    backbone_config=dict(
        depth=2,
        position_encoding_size=[4, 4],
        window_indices=[0],
        block_config=dict(dim=48, heads=6, mlp_ratio=2, window_size=[2, 2]),
    ),
    rpn_config=dict(pre_nms_topk=200, post_nms_topk=50),
    roi_config=dict(test_topk_per_image=20),
)


class TestViTDetEndToEnd:
    def test_dense_forward(self, rng):
        config = dict(TINY_VITDET)
        model = ViTDet(**config)
        params = model.init(jax.random.PRNGKey(0))
        state = model.init_state()
        frame = rng.integers(0, 255, (1, 3, 56, 60), dtype=np.uint8)
        result, state = model.apply(Ctx(), params, state, frame)
        assert result["boxes"].shape == (20, 4)
        assert result["scores"].shape == (20,)
        assert result["labels"].shape == (20,)
        assert np.isfinite(np.asarray(result["boxes"])).all()

    def test_eventful_multi_frame(self, rng):
        from eventful_transformer_tpu.core.gating import TokenGate
        from eventful_transformer_tpu.core.policies import TokenNormTopK
        from eventful_transformer_tpu.utils.misc import set_policies

        config = dict(TINY_VITDET)
        config["backbone_config"] = dict(
            TINY_VITDET["backbone_config"],
            block_class="EventfulBlock",
            windowed_class="EventfulTokenwiseBlock",
        )
        model = ViTDet(**config)
        set_policies(model, TokenNormTopK, k=16)  # full budget (4x4 grid)
        dense = ViTDet(**TINY_VITDET)
        params = model.init(jax.random.PRNGKey(0))
        state = model.init_state()
        frames = rng.integers(0, 255, (3, 1, 3, 56, 60), dtype=np.uint8)
        for t in range(3):
            result, state = model.apply(Ctx(), params, state, frames[t])
            want, _ = dense.apply(Ctx(), params, {"blocks": [{}, {}]}, frames[t])
            np.testing.assert_allclose(
                np.asarray(result["boxes"]), np.asarray(want["boxes"]),
                rtol=1e-3, atol=1e-3,
            )


class TestCascadeROIHeads:
    """Oracle tests for the 3-stage cascade (reference
    configs/detectron/vitdet_b_coco.py:22-48): stage chaining, per-stage
    Box2Box weights, class-agnostic regression, score averaging."""

    def _build(self, rng, classes=4, channels=8):
        from eventful_transformer_tpu.detection.roi_heads import CascadeROIHeads

        heads = CascadeROIHeads(
            num_classes=classes,
            in_channels=channels,
            conv_dims=(8,),
            fc_dims=(16,),
            test_topk_per_image=10,
            test_score_thresh=0.0,
        )
        params = heads.init(jax.random.PRNGKey(3))
        # non-trivial predictors (init gives ~0 weights for bbox_pred)
        def bump(p, key):
            leaves, treedef = jax.tree_util.tree_flatten(p)
            keys = jax.random.split(key, len(leaves))
            return jax.tree_util.tree_unflatten(
                treedef,
                [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)],
            )
        params = bump(params, jax.random.PRNGKey(7))
        features = [
            jnp.asarray(rng.standard_normal((1, 16 // s, 16 // s, channels)).astype(np.float32))
            for s in (1, 2, 4, 8)
        ]
        proposals = jnp.asarray(
            np.stack([
                np.array([2.0, 2.0, 30.0, 28.0]),
                np.array([8.0, 4.0, 40.0, 44.0]),
                np.array([1.0, 1.0, 60.0, 62.0]),
            ]).astype(np.float32)
        )
        mask = jnp.ones((3,), bool)
        return heads, params, features, proposals, mask

    def test_stage_chaining_oracle(self, rng):
        """Independent numpy/jnp reimplementation of the cascade recursion:
        per-stage pooled->head->predict, class-agnostic refinement with the
        stage's own weights, averaged softmax scores, last-stage boxes."""
        heads, params, features, proposals, mask = self._build(rng)
        image_size = (64, 64)
        got = heads.inference(params, features, proposals, mask, image_size)

        from eventful_transformer_tpu.detection.boxes import apply_deltas as ad
        from eventful_transformer_tpu.detection.boxes import clip_boxes

        boxes = proposals
        probs = []
        for sp, w in zip(params["stages"], heads.stage_box_weights):
            pooled = heads._pool(features, boxes)
            feats = heads.box_head(sp, pooled)
            scores, deltas = heads.predict(sp, feats)
            probs.append(jax.nn.softmax(scores, axis=-1))
            boxes = clip_boxes(ad(deltas.reshape(-1, 4), boxes, weights=w), image_size)
        mean_probs = (probs[0] + probs[1] + probs[2]) / 3.0
        want = heads._nms_tail(
            mean_probs[:, : heads.num_classes], boxes[:, None, :], mask, image_size
        )
        np.testing.assert_allclose(np.asarray(got["boxes"]), np.asarray(want["boxes"]))
        np.testing.assert_allclose(np.asarray(got["scores"]), np.asarray(want["scores"]))
        # stages actually refine: boxes differ from proposals
        assert not np.allclose(np.asarray(boxes), np.asarray(proposals))

    def test_stage_weights_and_agnostic_shape(self, rng):
        heads, params, *_ = self._build(rng)
        assert heads.stage_box_weights == (
            (10.0, 10.0, 5.0, 5.0),
            (20.0, 20.0, 10.0, 10.0),
            (30.0, 30.0, 15.0, 15.0),
        )
        assert len(params["stages"]) == 3
        # class-agnostic: 4 outputs, not 4 * num_classes
        assert params["stages"][0]["bbox_pred"]["kernel"].shape[-1] == 4

    def test_coco_config_selects_cascade(self):
        from eventful_transformer_tpu.detection.roi_heads import (
            CascadeROIHeads,
            StandardROIHeads,
        )
        from eventful_transformer_tpu.utils.config import load_config

        coco = load_config("configs/models/vitdet_b_coco.yml")
        vid = load_config("configs/models/vitdet_b_vid.yml")
        assert coco["model"]["roi_config"]["cascade"] is True
        assert vid["model"]["roi_config"]["cascade"] is False
        config = dict(TINY_VITDET)
        config["roi_config"] = dict(config["roi_config"], cascade=True)
        model = ViTDet(**config)
        assert type(model.roi_heads) is CascadeROIHeads
        assert type(ViTDet(**TINY_VITDET).roi_heads) is StandardROIHeads

    def test_cascade_end_to_end(self, rng):
        config = dict(TINY_VITDET)
        config["roi_config"] = dict(config["roi_config"], cascade=True)
        model = ViTDet(**config)
        params = model.init(jax.random.PRNGKey(0))
        state = model.init_state()
        frame = rng.integers(0, 255, (1, 3, 56, 60), dtype=np.uint8)
        result, state = model.apply(Ctx(), params, state, frame)
        assert result["boxes"].shape == (20, 4)
        assert np.isfinite(np.asarray(result["boxes"])).all()


class TestMeanAP:
    def test_perfect_predictions(self):
        from eventful_transformer_tpu.detection.map_metric import MeanAveragePrecision

        m = MeanAveragePrecision()
        target = {"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
                  "labels": np.array([1, 2])}
        pred = {"boxes": target["boxes"], "scores": np.array([0.9, 0.8]),
                "labels": target["labels"]}
        m.update([pred], [target])
        out = m.compute()
        assert out["map"] == pytest.approx(1.0)
        assert out["map_50"] == pytest.approx(1.0)

    def test_half_matched(self):
        from eventful_transformer_tpu.detection.map_metric import MeanAveragePrecision

        m = MeanAveragePrecision()
        target = {"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
                  "labels": np.array([0, 0])}
        # one exact match (high score), one total miss (low score)
        pred = {"boxes": np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32),
                "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}
        m.update([pred], [target])
        out = m.compute()
        # recall caps at 0.5 with precision 1.0 up to that point:
        # 101-pt AP = 51/101
        assert out["map_50"] == pytest.approx(51 / 101, abs=1e-6)

    def test_localization_quality_affects_map(self):
        from eventful_transformer_tpu.detection.map_metric import MeanAveragePrecision

        m = MeanAveragePrecision()
        target = {"boxes": np.array([[0, 0, 10, 10]], np.float32), "labels": np.array([0])}
        pred = {"boxes": np.array([[0, 0, 10, 8]], np.float32),  # IoU 0.8
                "scores": np.array([0.9]), "labels": np.array([0])}
        m.update([pred], [target])
        out = m.compute()
        assert out["map_50"] == pytest.approx(1.0)
        assert out["map_75"] == pytest.approx(1.0)  # IoU 0.8 >= 0.75
        assert out["map"] == pytest.approx(7 / 10, abs=1e-6)  # passes 0.5..0.8


class TestNativeMAP:
    def test_native_matches_numpy(self, rng):
        from eventful_transformer_tpu.detection.map_metric import MeanAveragePrecision
        from eventful_transformer_tpu.native import load

        if load("map_matcher") is None:
            pytest.skip("no C++ toolchain")
        preds, targets = [], []
        for i in range(12):
            n_gt = int(rng.integers(0, 6))
            n_pr = int(rng.integers(0, 10))
            base = rng.uniform(0, 80, (max(n_gt, 1), 2))
            gt = np.concatenate([base, base + rng.uniform(5, 30, base.shape)], 1)[:n_gt]
            pb = rng.uniform(0, 80, (n_pr, 2))
            pr = np.concatenate([pb, pb + rng.uniform(5, 30, pb.shape)], 1)
            # mix of near-GT and random boxes
            for j in range(min(n_gt, n_pr)):
                if rng.random() < 0.6:
                    pr[j] = gt[j] + rng.normal(0, 2, 4)
            targets.append({"boxes": gt.astype(np.float32),
                            "labels": rng.integers(0, 3, n_gt)})
            preds.append({"boxes": pr.astype(np.float32),
                          "scores": rng.uniform(0.1, 1, n_pr).astype(np.float32),
                          "labels": rng.integers(0, 3, n_pr)})
        m_native = MeanAveragePrecision(use_native=True)
        m_numpy = MeanAveragePrecision(use_native=False)
        m_native.update(preds, targets)
        m_numpy.update(preds, targets)
        a, b = m_native.compute(), m_numpy.compute()
        for key in ("map", "map_50", "map_75"):
            assert a[key] == pytest.approx(b[key], abs=1e-9), key


class TestMaskHead:
    def test_cascade_with_mask_end_to_end(self, rng):
        """COCO-style cascade + mask head: 28x28 per-detection masks of the
        detected class, in [0, 1], fixed shapes."""
        config = dict(TINY_VITDET)
        config["roi_config"] = dict(
            config["roi_config"], cascade=True, with_mask=True
        )
        model = ViTDet(**config)
        params = model.init(jax.random.PRNGKey(0))
        state = model.init_state()
        frame = rng.integers(0, 255, (1, 3, 56, 60), dtype=np.uint8)
        result, _ = model.apply(Ctx(), params, state, frame)
        masks = np.asarray(result["masks"])
        assert masks.shape == (20, 28, 28)
        assert np.isfinite(masks).all() and (masks >= 0).all() and (masks <= 1).all()

    def test_predictor_picks_label_channel(self, rng):
        from eventful_transformer_tpu.detection.mask_head import MaskHead

        head = MaskHead(num_classes=4, in_channels=8, conv_dims=(8,))
        params = head.init(jax.random.PRNGKey(1))
        # make the predictor produce channel-identifiable logits
        k = np.zeros((1, 1, 8, 4), np.float32)
        b = np.asarray([10.0, -10.0, 20.0, -20.0], np.float32)
        params["predictor"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
        features = [
            jnp.asarray(rng.standard_normal((1, 16 // s, 16 // s, 8)).astype(np.float32))
            for s in (1, 2, 4, 8)
        ]
        boxes = jnp.asarray([[1.0, 1.0, 30.0, 30.0], [2.0, 2.0, 40.0, 40.0]])
        labels = jnp.asarray([0, 3], jnp.int32)
        masks = np.asarray(head.inference(params, features, boxes, labels))
        # sigmoid(10) ~ 1 for label 0; sigmoid(-20) ~ 0 for label 3
        assert (masks[0] > 0.99).all()
        assert (masks[1] < 0.01).all()

    def test_coco_config_enables_mask(self):
        from eventful_transformer_tpu.utils.config import load_config

        coco = load_config("configs/models/vitdet_b_coco.yml")
        assert coco["model"]["roi_config"]["with_mask"] is True
