"""Count copy/transpose ops by shape in the optimized HLO of the e2e step.

Diagnostic for the batch-1 e2e scan-carry copy overhead (~1.1 ms/frame of
eventful-only copies attributed to the frame scan in the device profile):
compiles the same jitted function bench.py's vitdet-e2e workload runs
(AOT — no execution, safe to run while the chip is busy) and prints every
copy/transpose/dynamic-update-slice in the while body grouped by shape, so
the carries that fail in-place buffer sharing can be identified.

Usage: python scripts/misc/hlo_copies.py [--size 672] [--dense] [--frames 8]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=672)
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--ops", default="copy,transpose,dynamic-update-slice")
    args = ap.parse_args()

    from functools import partial

    from eventful_transformer_tpu.core.counting import Ctx
    from eventful_transformer_tpu.core.policies import TokenNormTopK
    from eventful_transformer_tpu.models.vitdet import ViTDet
    from eventful_transformer_tpu.utils.config import load_config
    from eventful_transformer_tpu.utils.misc import set_policies
    from eventful_transformer_tpu.utils.timing import scalar_probe

    name = ("base" if args.dense else "spatiotemporal") + f"_{args.size}"
    config = load_config(f"configs/evaluate/vitdet_vid/{name}.yml")
    model = ViTDet(**config["model"])
    if not args.dense:
        set_policies(model, TokenNormTopK, k=256)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    state = model.init_state(1, jnp.bfloat16)
    frames = jnp.zeros(
        (args.frames, 1, 3, args.size, args.size), jnp.bfloat16
    )

    def fwd(p, st, fr):
        aux = model.precompute(p)

        def body(carry, frame):
            out, s = model.apply(
                Ctx(), p, carry, frame, aux,
                mode=None if args.dense else "incremental",
            )
            return s, scalar_probe(out)

        st, probes = jax.lax.scan(body, st, fr, unroll=args.unroll)
        return st, jnp.sum(probes)

    lowered = jax.jit(fwd).lower(params, state, frames)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO: {len(txt.splitlines())} lines", file=sys.stderr)

    ops = args.ops.split(",")
    # optimized-HLO lines: `%name = bf16[2,4096,768]{2,1,0:T(8,128)(2,1)} copy(...)`
    pat = re.compile(
        r"^\s*%?[\w.\-]+ = ([a-z0-9]+\[[\d,]*\])(?:\{[^}]*\})? ("
        + "|".join(re.escape(o) for o in ops)
        + r")\("
    )
    counts = collections.Counter()
    bytes_of = collections.Counter()

    def shape_bytes(s):
        m = re.match(r"(\w+)\[([\d,]*)\]", s)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        unit = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "pred": 1, "s8": 1, "u8": 1, "s64": 8}.get(dt, 4)
        return n * unit

    for line in txt.splitlines():
        m = pat.match(line)
        if m:
            shape, op = m.groups()
            counts[(op, shape)] += 1
            bytes_of[(op, shape)] += shape_bytes(shape)

    total = 0
    print(f"{'count':>6} {'MB':>9}  op shape")
    for (op, shape), n in sorted(
        counts.items(), key=lambda kv: -bytes_of[kv[0]]
    )[:40]:
        mb = bytes_of[(op, shape)] / 1e6
        total += mb
        print(f"{n:>6} {mb:>9.2f}  {op} {shape}")
    print(f"total bytes across listed: {total:.1f} MB (static count, "
          f"x{args.frames // max(args.unroll,1)} iterations if in while body)")


if __name__ == "__main__":
    main()
