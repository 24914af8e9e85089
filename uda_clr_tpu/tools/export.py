"""Sealed serving artifact for the segmenter via ``jax.export`` (StableHLO).

The reference's only deployment story is a ``torch.save``'d training
checkpoint that a consumer must re-hydrate with the full model codebase
(/root/reference/train_process/Trainer_prototype_full.py:176-207 writes it,
/root/reference/train_use_fix_initial.py:228-256 re-loads it into freshly
constructed ``DeepLab``/optimizer objects). This tool provides the
TPU-native equivalent of a production inference artifact instead: the eval
forward is lowered ONCE to StableHLO with the trained weights baked in as
constants, serialized to a single file, and can be re-loaded and executed
on a serving host **without the model code, the config system, or the
checkpoint-conversion stack** — only ``jax`` itself.

Properties of the artifact:

* **Batch-polymorphic.** Exported with a symbolic batch dimension
  (``jax.export.symbolic_shape``), so one artifact serves any request
  batch size without recompilation at the StableHLO level (the serving
  runtime still JIT-caches per concrete shape, as usual for XLA).
* **Multi-platform.** Lowered for TPU and CPU in one artifact by default
  (``platforms=("tpu", "cpu")``), so the same file runs on a TPU serving
  pod and on a CPU canary/fallback host.
* **Wire-format aware.** With ``wire='u8'`` the artifact's input is the
  raw ``uint8`` ROI crop (HWC, 0..255) and the ``Normalize_tf`` scaling
  (``u/127.5 - 1``, custom_transforms.py:443) is compiled INTO the graph
  via the bit-exact device decode (data/wire.py) — the serving frontend
  ships 4x fewer bytes and does zero float math.
* **Self-describing outputs.** Returns sigmoid probabilities
  ``{"mask_probs": [b,S,S,2] (ch0=cup, ch1=disc), "boundary_probs":
  [b,S,S,1]}`` — the quantities every reference consumer thresholds
  (0.75 eval metrics, utils/metrics.py:128; 0.5/0.1 postprocessing,
  Utils.py:444-445). Thresholding/morphology stay host-side, exactly like
  the reference's offline flow.

Usage:
  python -m uda_clr_tpu.tools.export --checkpoint runs/x/checkpoints/best \
      --out model.uda.stablehlo [--image-size 512] [--use_TN] [--wire u8] \
      [--platforms tpu,cpu] [--selftest]

Loading on the serving host (no uda_clr_tpu needed):
  import jax
  exp = jax.export.deserialize(open("model.uda.stablehlo", "rb").read())
  outs = exp.call(images)           # or jax.jit(exp.call)(images)
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = b"UDA1"  # artifact header: magic + u32 meta length + meta JSON + payload


def make_serving_fn(model, variables, wire: str = "f32"):
    """Eval forward closed over ``variables``: image -> sigmoid prob dict.

    ``wire='u8'``: input is raw uint8 pixels (0..255); the bit-exact
    ``Normalize_tf`` decode (data/wire.py) is part of the traced graph.
    ``wire='f32'``: input is the already-normalized fp32 image in [-1, 1].
    """
    from uda_clr_tpu.data import wire as wire_lib

    def fn(image):
        if wire == "u8":
            image = wire_lib.decode_batch({"image": image})["image"]
        out = model.apply(variables, image, train=False)
        return {
            "mask_probs": jax.nn.sigmoid(out.mask_logits.astype(jnp.float32)),
            "boundary_probs": jax.nn.sigmoid(out.boundary_logits.astype(jnp.float32)),
        }

    return fn


def export_serving(model, variables, image_size: int, wire: str = "f32",
                   platforms=("tpu", "cpu")):
    """Lower the serving fn to a batch-polymorphic ``jax.export.Exported``."""
    fn = make_serving_fn(model, variables, wire=wire)
    (b,) = jax.export.symbolic_shape("b")
    dtype = jnp.uint8 if wire == "u8" else jnp.float32
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, 3), dtype)
    return jax.export.export(jax.jit(fn), platforms=list(platforms))(spec)


def save_artifact(exported, path: str, meta: dict) -> int:
    """Write ``MAGIC | u32 meta-json length | meta json | serialized HLO``.

    The tiny header lets a serving frontend learn the input contract
    (shape/dtype/wire/platforms) without deserializing the HLO payload.
    Returns total bytes written.
    """
    payload = exported.serialize()
    blob = json.dumps(meta, sort_keys=True).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(len(blob).to_bytes(4, "little"))
        f.write(blob)
        f.write(payload)
    return len(MAGIC) + 4 + len(blob) + len(payload)


def load_artifact(path: str):
    """Read an artifact file -> (meta dict, ``jax.export.Exported``)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC:
        raise ValueError(f"{path}: not a UDA serving artifact (bad magic {raw[:4]!r})")
    n = int.from_bytes(raw[4:8], "little")
    meta = json.loads(raw[8 : 8 + n].decode("utf-8"))
    exported = jax.export.deserialize(raw[8 + n :])
    return meta, exported


def main(argv=None):
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.train import checkpoint as ckpt_lib

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir/tag or reference .pth.tar "
                        "(default: fresh init, for pipeline smoke tests)")
    p.add_argument("--out", required=True)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--use_TN", action="store_true")
    p.add_argument("--wire", choices=("f32", "u8"), default="f32")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma list; each must be lowerable in this env")
    p.add_argument("--selftest", action="store_true",
                   help="reload the artifact and check it against the live "
                        "model on a random batch before reporting success")
    args = p.parse_args(argv)

    norm = "tn" if args.use_TN else "bn"
    model = DeepLab(num_classes=2, backbone="mobilenet", norm=norm)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.image_size, args.image_size, 3)), train=False,
    )
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pth.tar")):
            from uda_clr_tpu.convert.torch_import import load_reference_checkpoint

            conv = load_reference_checkpoint(args.checkpoint)
            params, stats = conv["gen"]
            variables = {"params": params, "batch_stats": stats}
        else:
            import os

            d, tag = os.path.split(args.checkpoint.rstrip("/"))
            variables, _ = ckpt_lib.restore_checkpoint(d, tag, variables)

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    exported = export_serving(model, variables, args.image_size,
                              wire=args.wire, platforms=platforms)
    meta = {
        "input": {"shape": ["b", args.image_size, args.image_size, 3],
                  "dtype": "uint8" if args.wire == "u8" else "float32",
                  "layout": "NHWC", "wire": args.wire},
        "outputs": {"mask_probs": "[b,S,S,2] sigmoid, ch0=cup ch1=disc",
                    "boundary_probs": "[b,S,S,1] sigmoid"},
        "norm": norm,
        "platforms": list(platforms),
        "checkpoint": args.checkpoint or "fresh-init",
    }
    nbytes = save_artifact(exported, args.out, meta)

    if args.selftest:
        meta2, exp2 = load_artifact(args.out)
        rng = np.random.default_rng(0)
        if args.wire == "u8":
            x = rng.integers(0, 256, (2, args.image_size, args.image_size, 3),
                             dtype=np.uint8)
        else:
            x = rng.uniform(-1, 1, (2, args.image_size, args.image_size, 3)
                            ).astype(np.float32)
        got = exp2.call(x)
        want = jax.jit(make_serving_fn(model, variables, wire=args.wire))(x)
        err = max(float(jnp.max(jnp.abs(got[k] - want[k]))) for k in want)
        if err > 1e-6:
            raise SystemExit(f"selftest FAILED: max |artifact - live| = {err}")
        meta["selftest_max_abs_err"] = err

    print(json.dumps({"out": args.out, "bytes": nbytes, **meta}))


if __name__ == "__main__":
    main()
