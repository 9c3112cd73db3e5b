"""Drive scripts/evaluate/vitdet_vid.py::evaluate_vitdet_metrics end-to-end
with a tiny eventful ViTDet and synthetic VID-shaped data — covers the
static flush/incremental step split (frame 0 of each video compiles a
"flush" program, the rest an "incremental" one; reference protocol
scripts/evaluate/vitdet_vid.py:33-38 resets state per video) and the
capacity-bucketed threshold dispatch."""

import sys
from pathlib import Path

import numpy as np

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.evaluate.vitdet_vid import evaluate_vitdet_metrics

from eventful_transformer_tpu.models.vitdet import ViTDet
from eventful_transformer_tpu.utils.misc import set_policies

TINY = dict(
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
        block_class="EventfulBlock",
        windowed_class="EventfulTokenwiseBlock",
        block_config=dict(dim=48, heads=6, mlp_ratio=2, window_size=[2, 2]),
    ),
    rpn_config=dict(pre_nms_topk=200, post_nms_topk=50),
    roi_config=dict(test_topk_per_image=20),
)


class _SyntheticVID:
    """Two 3-frame videos of slightly-varying frames + one GT box each."""

    def __init__(self, rng):
        self.videos = []
        for _ in range(2):
            base = rng.integers(0, 255, (3, 56, 60)).astype(np.float32)
            frames = [
                np.clip(base + rng.normal(0, 4, base.shape), 0, 255)
                for _ in range(3)
            ]
            ann = {
                "boxes": np.asarray([[4.0, 4.0, 40.0, 40.0]], np.float32),
                "labels": np.asarray([1], np.int32),
            }
            self.videos.append([(f, ann) for f in frames])

    def __len__(self):
        return len(self.videos)

    def __getitem__(self, i):
        return self.videos[i]


def _run(model, config):
    params = model.init(jax.random.PRNGKey(0))
    data = _SyntheticVID(np.random.default_rng(0))
    result = evaluate_vitdet_metrics(model, params, data, config)
    assert np.isfinite(result["metrics"]["map"])
    assert result["counts"]["linear_flops"] > 0
    return result


def test_eval_driver_topk():
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    model = ViTDet(**TINY)
    set_policies(model, TokenNormTopK, k=8)
    _run(model, {"n_items": 2})


def test_eval_driver_bucketed_threshold():
    from eventful_transformer_tpu.core.policies import TokenNormThreshold

    model = ViTDet(**TINY)
    set_policies(model, TokenNormThreshold, threshold=0.05)
    r = _run(model, {"n_items": 2, "bucket_capacities": [4, 8, 16]})
    # threshold counting must report the policy's own gate flops
    assert "gate_flops" in r["counts"]
