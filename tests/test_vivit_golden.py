"""FULL-MODEL golden parity: our FactorizedViViT vs the reference PyTorch
model, end-to-end from raw video to class probabilities, with weights
converted through the real conversion pipeline (convert_torch_state_dict).

Inputs are sized exactly to the crop so the reference's resize path is a
no-op (torchvision is stubbed; everything else is the genuine reference
code). Covers: preprocessing views, tubelet embedding, position encoding,
class tokens, the per-frame spatial loop vs our lax.scan, the temporal
model, classifier, view-mean and softmax — dense AND eventful."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.ref_loader import load_reference  # noqa: E402

REF = load_reference()


def _load_ref_vivit():
    # models.vivit imports utils.image (stubbed deps handled by ref_loader).
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models.vivit as ref_vivit

    return ref_vivit


CONFIG = dict(
    classes=11,
    input_shape=[8, 3, 32, 32],
    normalize_mean=0.45,
    normalize_std=0.225,
    spatial_views=2,
    temporal_stride=2,
    temporal_views=2,
    tubelet_shape=[2, 8, 8],
    spatial_config=dict(
        depth=2,
        position_encoding_size=[4, 4],
        block_config=dict(dim=24, heads=3, mlp_ratio=2),
    ),
    temporal_config=dict(
        depth=1,
        position_encoding_size=[4],
        block_config=dict(dim=24, heads=3, mlp_ratio=2),
    ),
)


def _build_pair(spatial_overrides=None):
    from eventful_transformer_tpu.models import FactorizedViViT
    from eventful_transformer_tpu.utils.params import convert_torch_state_dict, fill_like

    ref_vivit = _load_ref_vivit()
    config = dict(CONFIG)
    if spatial_overrides:
        config["spatial_config"] = dict(CONFIG["spatial_config"], **spatial_overrides)
    torch.manual_seed(0)
    ref = ref_vivit.FactorizedViViT(**config)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    ref.eval()
    ours = FactorizedViViT(**config)
    template = ours.init(jax.random.PRNGKey(0))
    params = fill_like(template, convert_torch_state_dict(ref.state_dict()))
    return ref, ours, params


class TestFullModelGolden:
    def test_dense_end_to_end(self, rng):
        from eventful_transformer_tpu.core.counting import Ctx

        ref, ours, params = _build_pair()
        # video sized exactly to the crop: the reference resize is a no-op.
        video = rng.integers(0, 255, (1, 20, 3, 32, 32), dtype=np.uint8)
        with torch.inference_mode():
            want = ref(torch.from_numpy(video.copy())).numpy()
        got = np.asarray(ours.apply(Ctx(), params, video))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_eventful_end_to_end(self, rng):
        from eventful_transformer_tpu.core.counting import Counts, Ctx
        from eventful_transformer_tpu.core.gating import TokenGate
        from eventful_transformer_tpu.core.policies import TokenNormTopK
        from eventful_transformer_tpu.utils.misc import set_policies

        ref, ours, params = _build_pair({"block_class": "EventfulBlock"})
        for cls in (REF.modules.TokenDeltaGate, REF.modules.TokenGate):
            for m in ref.modules():
                if type(m) is cls:
                    m.policy = REF.policies.TokenNormTopK(6)
        set_policies(ours, TokenNormTopK, k=6)
        video = rng.integers(0, 255, (1, 20, 3, 32, 32), dtype=np.uint8)
        ref.reset()
        ref.counting()
        with torch.inference_mode():
            want = ref(torch.from_numpy(video.copy())).numpy()
        ctx = Ctx(count_mode=True)
        got = np.asarray(ours.apply(ctx, params, video))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        # FLOP-count parity for the whole clip.
        ref_counts = dict(ref.total_counts())
        our_counts = Counts.from_device(ctx.counts).nonzero()
        for key, val in ref_counts.items():
            assert our_counts[key] == pytest.approx(val, rel=1e-5), key
