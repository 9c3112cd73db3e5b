"""Full-scale (real ViViT-B, ~90M params) conversion proof.

Checkpoint downloads are blocked in this environment (no egress), so the
TAdaConv -> .npz -> model pipeline is proven on a SYNTHETIC checkpoint with
the real layout at the real scale:

  1. instantiate the reference PyTorch FactorizedViViT at the genuine
     ViViT-B Kinetics-400 operating point (dim 768, 12+4 blocks, 400
     classes — configs/models/vivit_b_kinetics400.yml);
  2. rewrite its state_dict into TAdaConv checkpoint naming (the inverse of
     configs/convert/vivit_b.txt) and save it as a .pyth file;
  3. run the real converter script (scripts/convert/vivit.py main()) on it;
  4. load the .npz into our model template — fill_like validates EVERY
     parameter path and shape at full scale;
  5. ALSO remap the synthetic checkpoint with the pattern file and
     load_state_dict(strict=True) into the reference model — proving the
     TAdaConv->reference naming is complete w.r.t. the real module tree;
  6. forward parity between the reference model and ours on a short clip.

This is the strongest conversion guarantee available without network access
(BASELINE.md records the blocked-by-environment note).
"""

import re
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from tests.ref_loader import load_reference  # noqa: E402

load_reference()

# Real ViViT-B K400 dims (configs/models/vivit_b_kinetics400.yml) with 1x1
# views (instead of 3x4) so the CPU forward stays tractable — parameters,
# token counts and the 32-frame clip are all at the real operating point.
CONFIG = dict(
    classes=400,
    input_shape=[32, 3, 224, 224],
    normalize_mean=0.45,
    normalize_std=0.225,
    spatial_views=1,
    temporal_stride=2,
    temporal_views=1,
    tubelet_shape=[2, 16, 16],
    spatial_config=dict(
        depth=12,
        position_encoding_size=[14, 14],
        block_config=dict(dim=768, heads=12, mlp_ratio=4),
    ),
    temporal_config=dict(
        depth=4,
        position_encoding_size=[16],
        block_config=dict(dim=768, heads=12, mlp_ratio=4),
    ),
)

# Inverse of configs/convert/vivit_b.txt: reference names -> TAdaConv names.
_TO_TADACONV = [
    (re.compile(r"^embedding\.conv\."), "backbone.stem.conv1."),
    (re.compile(r"^spatial_model\.class_token$"), "backbone.cls_token"),
    (
        re.compile(r"^spatial_model\.backbone\.position_encoding\.encoding$"),
        "backbone.pos_embd",
    ),
    (
        re.compile(r"^spatial_model\.backbone\.blocks\.(\d+)\.input_layer_norm\."),
        r"backbone.layers.\1.norm.",
    ),
    (
        re.compile(r"^spatial_model\.backbone\.blocks\.(\d+)\.qkv\."),
        r"backbone.layers.\1.attn.to_qkv.",
    ),
    (
        re.compile(r"^spatial_model\.backbone\.blocks\.(\d+)\.projection\."),
        r"backbone.layers.\1.attn.proj.",
    ),
    (
        re.compile(r"^spatial_model\.backbone\.blocks\.(\d+)\.mlp_layer_norm\."),
        r"backbone.layers.\1.norm_ffn.",
    ),
    (
        re.compile(r"^spatial_model\.backbone\.blocks\.(\d+)\.mlp_1\."),
        r"backbone.layers.\1.ffn.net.0.",
    ),
    (
        re.compile(r"^spatial_model\.backbone\.blocks\.(\d+)\.mlp_2\."),
        r"backbone.layers.\1.ffn.net.3.",
    ),
    (re.compile(r"^spatial_model\.layer_norm\."), "backbone.norm."),
    (re.compile(r"^temporal_model\.class_token$"), "backbone.cls_token_out"),
    (
        re.compile(r"^temporal_model\.backbone\.position_encoding\.encoding$"),
        "backbone.temp_embd",
    ),
    (
        re.compile(r"^temporal_model\.backbone\.blocks\.(\d+)\.input_layer_norm\."),
        r"backbone.layers_temporal.\1.norm.",
    ),
    (
        re.compile(r"^temporal_model\.backbone\.blocks\.(\d+)\.qkv\."),
        r"backbone.layers_temporal.\1.attn.to_qkv.",
    ),
    (
        re.compile(r"^temporal_model\.backbone\.blocks\.(\d+)\.projection\."),
        r"backbone.layers_temporal.\1.attn.proj.",
    ),
    (
        re.compile(r"^temporal_model\.backbone\.blocks\.(\d+)\.mlp_layer_norm\."),
        r"backbone.layers_temporal.\1.norm_ffn.",
    ),
    (
        re.compile(r"^temporal_model\.backbone\.blocks\.(\d+)\.mlp_1\."),
        r"backbone.layers_temporal.\1.ffn.net.0.",
    ),
    (
        re.compile(r"^temporal_model\.backbone\.blocks\.(\d+)\.mlp_2\."),
        r"backbone.layers_temporal.\1.ffn.net.3.",
    ),
    (re.compile(r"^temporal_model\.layer_norm\."), "backbone.norm_out."),
    (re.compile(r"^classifier\."), "head.linear."),
]


def _to_tadaconv_name(ref_name):
    for regex, repl in _TO_TADACONV:
        new, n = regex.subn(repl, ref_name)
        if n:
            return new
    raise AssertionError(f"no TAdaConv mapping for reference key {ref_name}")


@pytest.mark.slow
def test_full_scale_tadaconv_roundtrip(tmp_path, rng):
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models.vivit as ref_vivit

    from eventful_transformer_tpu.models import FactorizedViViT
    from eventful_transformer_tpu.utils.misc import parse_patterns, remap_weights
    from eventful_transformer_tpu.utils.params import fill_like

    torch.manual_seed(0)
    ref = ref_vivit.FactorizedViViT(**CONFIG)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
    ref.eval()
    n_params = sum(p.numel() for p in ref.parameters())
    assert n_params > 80e6, n_params  # genuinely full scale

    # 2. synthesize the TAdaConv-layout checkpoint
    tadaconv = {_to_tadaconv_name(k): v for k, v in ref.state_dict().items()}
    assert len(tadaconv) == len(ref.state_dict())
    ckpt = tmp_path / "vivit_b_synth.pyth"
    torch.save({"model_state": tadaconv}, ckpt)

    # 5. pattern-file completeness against the real reference module tree
    patterns = parse_patterns("configs/convert/vivit_b.txt")
    remapped, n_remapped = remap_weights(tadaconv, patterns)
    assert n_remapped == len(tadaconv)
    ref.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in remapped.items()}, strict=True
    )

    # 3. the real converter script, end to end (file -> .npz)
    sys.path.insert(0, str(Path("scripts", "convert").resolve()))
    import importlib

    vivit_convert = importlib.import_module("vivit")
    out_npz = tmp_path / "vivit_b.npz"

    class Args:
        in_file = str(ckpt)
        out_file = str(out_npz)
        pattern_file = "configs/convert/vivit_b.txt"
        verbose = False

    vivit_convert.main(Args())
    assert out_npz.exists()

    # 4. every path and shape of the full-scale template is satisfied
    ours = FactorizedViViT(**CONFIG)
    template = ours.init(jax.random.PRNGKey(0))
    flat = dict(np.load(out_npz))
    params = fill_like(template, flat)

    # 6. forward parity at the real operating dims
    from eventful_transformer_tpu.core.counting import Ctx

    video = rng.integers(0, 255, (1, 32, 3, 224, 224), dtype=np.uint8)
    with torch.inference_mode():
        want = ref(torch.from_numpy(video.copy())).numpy()
    got = np.asarray(ours.apply(Ctx(), params, video))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
