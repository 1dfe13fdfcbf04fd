#!/usr/bin/env python
"""One-time converter: pretrained LPIPS (AlexNet) -> numpy .npz for JAX eval.

The reference evaluates LPIPS via torchmetrics' pretrained AlexNet
(lsenerf.py:205-207). This environment has no network egress, so the weights
cannot be fetched here; run this script ONCE on any machine with the `lpips`
package installed (pip install lpips) and copy the output to
`<repo>/assets/lpips_alex.npz` (or point $LSENERF_LPIPS_WEIGHTS at it).
`lsenerf_tpu.ops.metrics.LPIPSMetric` auto-discovers it from either location.

Exported keys (the layout `ops/metrics._lpips_forward` consumes):
    conv{i}_w  (out, in, kh, kw)   AlexNet feature convs, i = 0..4
    conv{i}_b  (out,)
    lin{i}_w   (1, c, 1, 1)        LPIPS linear heads (non-negative 1x1 convs)
    shift      (1, 3, 1, 1)        LPIPS input scaling layer
    scale      (1, 3, 1, 1)
    strides    (5,)                conv strides [4, 2, 1, 1, 1]
    pads       (5,)                conv paddings [2, 2, 1, 1, 1]

Usage:
    python scripts/export_lpips.py [out.npz]
"""

import sys

import numpy as np


def main(out_path: str = "lpips_alex.npz") -> None:
    try:
        import lpips  # noqa: F401
        import torch
    except ImportError as e:  # pragma: no cover - needs network-installed deps
        raise SystemExit(
            f"missing dependency ({e}); run on a machine with "
            "`pip install lpips torch` and network access for the "
            "pretrained-weight download, then copy the .npz here"
        )

    net = lpips.LPIPS(net="alex", spatial=False)
    net.eval()

    out = {
        "shift": net.scaling_layer.shift.detach().numpy(),
        "scale": net.scaling_layer.scale.detach().numpy(),
        "strides": np.array([4, 2, 1, 1, 1], np.int32),
        "pads": np.array([2, 2, 1, 1, 1], np.int32),
    }
    convs = [
        m
        for m in net.net.modules()
        if isinstance(m, torch.nn.Conv2d) and m.kernel_size != (1, 1)
    ]
    assert len(convs) == 5, f"expected 5 AlexNet convs, got {len(convs)}"
    for i, conv in enumerate(convs):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        out[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()

    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main(*sys.argv[1:2])
