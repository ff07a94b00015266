"""Export one of our checkpoints to the reference's torch format.

The reverse of the transparent torch import in ``train/checkpoint.py``:
takes a framework checkpoint (msgpack ``{epoch, loss, state}``) and writes
a ``torch.save`` dict in the reference drivers' layout —
``{epoch, loss, model_state_dict[, ema_model_state_dict]}``
(``/root/reference/pretrain.py:371-406``, ``/root/reference/train.py:569-585``)
— so a TPU-trained model can be evaluated, fine-tuned, or served with the
reference's torch tooling. No ``optimizer_state_dict`` is written: our flat
raveled Adam moments have no faithful per-parameter torch image, and the
reference's non-``--resume`` load paths never read it.

Usage:
    python -m iou3dmatch_tpu.cli.export_torch CHECKPOINT OUT.tar \
        [--dataset scannet|sunrgbd] [architecture flags as in the drivers]

The architecture flags must match the run that produced the checkpoint
(they determine the parameter tree the msgpack payload is restored into;
a mismatch fails loudly in flax restoration, never silently).
"""
import argparse

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("checkpoint", help="framework checkpoint (msgpack)")
    p.add_argument("out", help="output torch checkpoint path (.tar)")
    p.add_argument("--dataset", default="scannet",
                   choices=["scannet", "sunrgbd"])
    # architecture flags, same names/defaults as cli/train.py + cli/pretrain.py
    p.add_argument("--num_target", type=int, default=128)
    p.add_argument("--no_height", action="store_true")
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--cluster_sampling", default="seed_fps")
    p.add_argument("--vote_factor", type=int, default=1)
    p.add_argument("--weight_decay", type=float, default=0.0,
                   help="must match the training run: a nonzero value "
                        "changes the optimizer-state tree the checkpoint "
                        "is restored through")
    p.add_argument("--tiny", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax

    try:
        # host-side work: never open the TPU tunnel for a format conversion
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized (library use) — any platform works

    import jax.numpy as jnp
    import torch
    from flax import serialization

    from ..models.factory import build_votenet
    from ..train import checkpoint
    from ..train.state import create_train_state
    from ..train.torch_import import export_state_dict, is_torch_checkpoint

    if is_torch_checkpoint(args.checkpoint):
        raise SystemExit(f"{args.checkpoint} is already a torch checkpoint")

    # Peek at the payload to learn whether this is an SSL checkpoint (has an
    # EMA teacher) before building the restoration template.
    with open(args.checkpoint, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    has_ema = bool(payload["state"].get("ema_params"))

    input_feature_dim = ((0 if args.no_height else 1)
                         + (3 if args.use_color else 0))
    model, _ = build_votenet(
        args.dataset, num_proposal=args.num_target,
        input_feature_dim=input_feature_dim,
        sampling=args.cluster_sampling, tiny=args.tiny,
        vote_factor=args.vote_factor)
    example = {"point_clouds": jnp.zeros(
        (1, 1024 if args.tiny else 4096, 3 + input_feature_dim),
        jnp.float32)}
    template = create_train_state(model, jax.random.PRNGKey(0), example,
                                  with_ema=has_ema,
                                  weight_decay=args.weight_decay)
    state, epoch, loss = checkpoint.load(args.checkpoint, template)

    def to_torch_sd(params, batch_stats):
        sd = export_state_dict({"params": params, "batch_stats": batch_stats})
        return {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}

    out = {"epoch": epoch, "loss": loss,
           "model_state_dict": to_torch_sd(state.params, state.batch_stats)}
    if has_ema:
        out["ema_model_state_dict"] = to_torch_sd(state.ema_params,
                                                  state.ema_batch_stats)
    torch.save(out, args.out)
    n = len(out["model_state_dict"])
    print(f"wrote {args.out}: epoch {epoch}, {n} model entries"
          + (", ema included" if has_ema else ""))


if __name__ == "__main__":
    main()
