"""Import reference (PyTorch) checkpoints into our flax variable trees.

The reference saves torch pickles of
``{epoch, optimizer_state_dict, loss, model_state_dict[,
ema_model_state_dict]}`` (``/root/reference/pretrain.py:371-406``,
``/root/reference/train.py:569-585``) and its README links published
pretrained models in exactly that format (``/root/reference/README.md:118-133``).
This module lets a reference user bring those checkpoints straight into the
TPU framework: every parameter / batch-stat leaf of our flax VoteNet has a
unique reference ``state_dict`` key, derived structurally by
:func:`flax_path_to_torch_key`, so the import is a total, shape-checked
mapping rather than a name-guessing heuristic.

torch is imported lazily — only when a torch checkpoint is actually loaded —
so the training/eval paths stay torch-free.
"""
import re
import zipfile

import numpy as np

__all__ = [
    "export_state_dict",
    "flax_path_to_torch_key",
    "import_state_dict",
    "is_torch_checkpoint",
    "read_torch_checkpoint",
]


def flax_path_to_torch_key(path_names) -> str:
    """Map a flax variable path to the reference ``state_dict`` key.

    ours: ``params/backbone_net/sa1/mlp/dense0/kernel``
      ->  ``backbone_net.sa1.mlp_module.layer0.conv.weight``
    ours: ``batch_stats/vgen/bn1/mean`` -> ``vgen.bn1.running_mean``

    SharedMLP containers are called ``mlp_module`` by the reference's SA /
    vote-aggregation modules but keep their attribute name in FP (``mlp``)
    and GridConv (``mlp_before_iou``) — see
    ``/root/reference/pointnet2/pointnet2_modules.py:186,397`` and
    ``/root/reference/models/grid_conv_module.py:40``.
    """
    coll, *mods, leaf = path_names
    out = []
    shared_mlp = False
    for i, m in enumerate(mods):
        if m.startswith("mlp"):
            parent = mods[i - 1] if i else ""
            out.append(
                "mlp_module" if (m == "mlp" and not parent.startswith("fp"))
                else m)
            shared_mlp = True
        elif shared_mlp and re.fullmatch(r"dense\d+", m):
            out.append(f"layer{m[5:]}.conv")
        elif shared_mlp and re.fullmatch(r"bn\d+", m):
            out.append(f"layer{m[2:]}.bn.bn")
        else:
            out.append(m)
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    out.append(leaf_map[leaf])
    return ".".join(out)


def is_torch_checkpoint(path: str) -> bool:
    """True if ``path`` is a torch checkpoint (zip container — the default
    serialization since torch 1.6 — or a legacy bare pickle). Our own
    checkpoints are flax msgpack, whose first byte for the
    ``{epoch, loss, state}`` payload is a fixmap (0x83), never a pickle
    protocol-marker pair."""
    if zipfile.is_zipfile(path):
        return True
    with open(path, "rb") as f:
        head = f.read(2)
    # pickle.PROTO opcode (0x80) followed by a small protocol number;
    # msgpack fixmap bytes are 0x80|n followed by a key header (>= 0xa0)
    return len(head) == 2 and head[0] == 0x80 and head[1] <= 5


def read_torch_checkpoint(path: str) -> dict:
    """torch.load the reference checkpoint payload onto CPU, unwrapping any
    ``module.`` DataParallel prefixes in its state dicts."""
    import torch

    # weights_only: state dicts are plain tensor/number containers; never
    # execute checkpoint pickle code — this path exists precisely for
    # third-party published checkpoints (reference README.md:118-133).
    payload = torch.load(path, map_location="cpu", weights_only=True)

    def _unwrap(sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}

    for key in ("model_state_dict", "ema_model_state_dict"):
        if key in payload:
            payload[key] = _unwrap(payload[key])
    return payload


def import_state_dict(template_variables, state_dict, strict: bool = True):
    """Build a ``{params, batch_stats}`` tree shaped like
    ``template_variables`` from a reference torch ``state_dict``.

    Reference 1x1-conv weights ``(out, in, 1[, 1])`` become our Dense
    kernels ``(in, out)``; BN ``weight/bias/running_mean/running_var``
    become ``scale/bias/mean/var``. Our SharedMLP Dense layers are
    BIAS-FREE exactly like the reference's BN-followed convs
    (``/root/reference/pointnet2/pytorch_utils.py:14-39``, see
    models/mlp.py); the dense-bias zero-fill branch below survives only as
    a backstop for hand-built templates that still carry such a leaf.

    With ``strict`` (default), every reference entry except
    ``num_batches_tracked`` counters must be consumed, so architecture
    mismatches fail loudly instead of silently dropping weights.
    """
    import jax

    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    consumed = set()

    def _leaf(path, leaf):
        names = [p.key for p in path]
        key = flax_path_to_torch_key(names)
        if key not in sd:
            # Only SharedMLP Dense biases have no reference slot (the
            # reference's 1x1 convs inside SharedMLP are bias-free, see
            # export_state_dict); any other missing leaf means a
            # truncated/mismatched checkpoint and must fail loudly.
            if (names[-1] == "bias" and len(names) >= 2
                    and re.fullmatch(r"dense\d+", names[-2])
                    and any(m.startswith("mlp") for m in names[:-2])):
                return np.zeros(leaf.shape, np.asarray(leaf).dtype)
            raise KeyError(
                f"reference checkpoint has no entry for "
                f"{'/'.join(names)} (expected key {key!r})")
        val = sd[key]
        if names[-1] == "kernel":
            # (out, in, 1[, 1]) -> (in, out)
            val = val.reshape(val.shape[0], -1).T
        if val.shape != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch importing {key!r} -> {'/'.join(names)}: "
                f"checkpoint {val.shape} vs model {tuple(leaf.shape)}")
        consumed.add(key)
        return val.astype(np.asarray(leaf).dtype)

    out = jax.tree_util.tree_map_with_path(_leaf, template_variables)
    if strict:
        leftovers = {k for k in sd
                     if k not in consumed and "num_batches_tracked" not in k}
        if leftovers:
            raise ValueError(
                "reference checkpoint entries with no destination in this "
                f"model: {sorted(leftovers)[:8]}")
    return out


def export_state_dict(variables) -> dict:
    """The reverse mapping: our ``{params, batch_stats}`` tree as a
    reference-keyed torch ``state_dict`` (numpy values), so a TPU-trained
    model can go back to the reference's torch tooling.

    Conv-weight ranks follow the reference's module choices: layers inside
    a SharedMLP container are 1x1 ``Conv2d`` → ``(out, in, 1, 1)``
    (``/root/reference/pointnet2/pytorch_utils.py:14-39``); every other
    conv in the model is ``Conv1d`` → ``(out, in, 1)`` (voting / proposal /
    GridConv heads). Our zero Dense biases that have no reference slot are
    dropped. Load into a reference model with the reference's own
    filter-and-update pattern (``/root/reference/train.py:209-215``) or
    ``load_state_dict(..., strict=False)`` — the only keys absent are BN
    ``num_batches_tracked`` counters, which torch keeps at their prior
    values.
    """
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        names = [p.key for p in path]
        key = flax_path_to_torch_key(names)
        val = np.asarray(leaf)
        if names[-1] == "kernel":
            in_shared_mlp = any(m.startswith("mlp") for m in names[:-1])
            val = val.T  # (in, out) -> (out, in)
            val = val.reshape(
                val.shape + ((1, 1) if in_shared_mlp else (1,)))
        elif (names[-1] == "bias" and len(names) >= 2
              and re.fullmatch(r"dense\d+", names[-2])
              and any(m.startswith("mlp") for m in names[:-2])):
            # SharedMLP convs are bias-free in the reference AND (since the
            # mlp.py parity fix) in our model, so this branch is a backstop
            # for hand-built/legacy trees only: an all-zero bias before
            # BN's mean-subtraction drops out of the export losslessly
            if not val.any():
                continue
            raise ValueError(
                f"nonzero SharedMLP bias {'/'.join(names)} cannot be "
                "represented in the reference's bias-free 1x1 convs")
        out[key] = val
    return out
