"""Import the reference implementation (read-only, /root/reference) for
golden-parity testing. torchvision/matplotlib are not installed in this
environment; the reference's utils.image only needs a few attributes at
import time, so we stub just enough to import eventful_transformer.blocks."""

import sys
import types


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def load_reference():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    if "torchvision" not in sys.modules:
        import torch

        class InterpolationMode:
            BILINEAR = "bilinear"
            BICUBIC = "bicubic"

        class Normalize:
            """Minimal torchvision.transforms.Normalize (per-channel)."""

            def __init__(self, mean, std):
                def as_vec(v):
                    t = torch.as_tensor(v, dtype=torch.float32)
                    return t.reshape(-1, 1, 1)

                self.mean = as_vec(mean)
                self.std = as_vec(std)

            def __call__(self, x):
                return (x - self.mean) / self.std

        tv = _stub("torchvision")
        transforms = _stub(
            "torchvision.transforms",
            InterpolationMode=InterpolationMode,
            Normalize=Normalize,
        )
        func = _stub("torchvision.transforms.functional")
        tv.transforms = transforms
        transforms.functional = func
        tv.io = _stub("torchvision.io")

    if "matplotlib" not in sys.modules:
        try:
            import matplotlib  # noqa: F401
        except ImportError:
            mpl = _stub("matplotlib")
            mpl.pyplot = _stub("matplotlib.pyplot")

    import eventful_transformer.blocks as ref_blocks
    import eventful_transformer.modules as ref_modules
    import eventful_transformer.policies as ref_policies
    import eventful_transformer.utils as ref_utils

    return types.SimpleNamespace(
        blocks=ref_blocks, modules=ref_modules, policies=ref_policies, utils=ref_utils
    )


def torch_block_params(ref_block):
    """Convert a reference torch Block's parameters to our pytree layout
    (torch Linear is (out, in) -> JAX kernel (in, out))."""
    import jax.numpy as jnp

    def t(x):
        return jnp.asarray(x.detach().numpy())

    params = {
        "input_layer_norm": {
            "scale": t(ref_block.input_layer_norm.weight),
            "bias": t(ref_block.input_layer_norm.bias),
        },
        "mlp_layer_norm": {
            "scale": t(ref_block.mlp_layer_norm.weight),
            "bias": t(ref_block.mlp_layer_norm.bias),
        },
        "qkv": {"kernel": t(ref_block.qkv.weight).T, "bias": t(ref_block.qkv.bias)},
        "projection": {
            "kernel": t(ref_block.projection.weight).T,
            "bias": t(ref_block.projection.bias),
        },
        "mlp_1": {"kernel": t(ref_block.mlp_1.weight).T, "bias": t(ref_block.mlp_1.bias)},
        "mlp_2": {"kernel": t(ref_block.mlp_2.weight).T, "bias": t(ref_block.mlp_2.bias)},
    }
    if ref_block.relative_position is not None:
        params["relative_position"] = {
            "y_embedding": t(ref_block.relative_position.y_embedding),
            "x_embedding": t(ref_block.relative_position.x_embedding),
        }
    return params
