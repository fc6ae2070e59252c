"""Checkpointing: the reference's ``torch.save({model, optimizer,
global_step})`` triple (`/root/reference/src/solver.py:204-218`) as
numpy-pytree archives, plus partial pretrained-module loading with the
prefix-rewrite semantics of `src/vqvae.py:71-90`.

Format: a single ``np.savez`` file carrying flattened ``path -> array``
entries for each of params / state / opt_state, plus the step. No pickle of
arbitrary objects — loadable anywhere numpy is.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}__seq__"] = np.asarray(
            [type(tree).__name__, str(len(tree))], dtype="U16")
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[f"{prefix}__none__"] = np.zeros(0)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat):
    # rebuild nested dict first
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if "__none__" in node:
            return None
        if "__seq__" in node:
            tname, n = node["__seq__"]
            seq = [rebuild(node[str(i)]) for i in range(int(n))]
            return tuple(seq) if tname == "tuple" else seq
        return {k: rebuild(v) for k, v in node.items() if k != "__seq__"}

    return rebuild(root)


def save_checkpoint(path, *, params, state, opt_state, step, extra=None):
    payload = {}
    for name, tree in [("model", params), ("state", state), ("optimizer", opt_state)]:
        tree = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
        payload.update(_flatten(tree, f"{name}/"))
    payload["global_step"] = np.asarray(step)
    if extra:
        payload["extra_json"] = np.asarray(json.dumps(extra))
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path):
    """Returns dict(model=..., state=..., optimizer=..., global_step=int)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    step = int(flat.pop("global_step"))
    extra = json.loads(str(flat.pop("extra_json"))) if "extra_json" in flat else None
    groups = {"model": {}, "state": {}, "optimizer": {}}
    for k, v in flat.items():
        head, rest = k.split("/", 1)
        groups[head][rest] = v
    out = {name: _unflatten(g) for name, g in groups.items()}
    out["global_step"] = step
    out["extra"] = extra
    return out


def load_subtree(path, subtree_key, _ckpt=None):
    """Load one top-level module's params from a checkpoint — the TPU
    equivalent of the reference's pretrained_asr/emb/tts prefix-rewritten
    partial ``load_state_dict`` (`src/vqvae.py:71-90`).

    ``subtree_key``: e.g. 'asr', 'codebook', 'tts/decoder'.
    """
    ckpt = _ckpt if _ckpt is not None else load_checkpoint(path)
    node = ckpt["model"]
    for part in subtree_key.split("/"):
        if part not in node:
            raise KeyError(f"Missing pretrained module {subtree_key!r} in {path}")
        node = node[part]
    return node


def _walk(tree, parts):
    """Descend ``parts`` in a nested dict; returns (parent, leaf_key) or None
    if any segment is missing."""
    node = tree
    for p in parts[:-1]:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    if not isinstance(node, dict) or parts[-1] not in node:
        return None
    return node, parts[-1]


def apply_pretrained(params, pretrained: dict, state=None):
    """Graft pretrained subtrees into freshly-initialized params (and state).

    ``pretrained``: mapping subtree_key -> checkpoint path (empty/None values
    skipped, as the reference treats '' as disabled). Each distinct file is
    loaded once even when several keys graft from it (decoder + postnet).

    ``state``: the model's non-param state pytree (BatchNorm running stats).
    torch's ``load_state_dict`` carries running stats along with parameters
    (`src/vqvae.py:71-90`); when the checkpoint's state tree has the same
    subtree path AND the target ``state`` does too, it is grafted likewise.
    Returns ``params`` alone (back-compat) or ``(params, state)`` when
    ``state`` is passed.
    """
    loaded = {}
    for key, path in (pretrained or {}).items():
        if not path:
            continue
        if path not in loaded:
            loaded[path] = load_checkpoint(path)
        sub = load_subtree(path, key, _ckpt=loaded[path])
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node[p]
        # shape-check every leaf (reference asserts no missing keys)
        ref = node[parts[-1]]
        jax.tree_util.tree_map(lambda a, b: None if np.shape(a) == np.shape(b) else
                               (_ for _ in ()).throw(ValueError("shape mismatch")), ref, sub)
        node[parts[-1]] = jax.tree_util.tree_map(lambda a: np.asarray(a), sub)

        if state is not None:
            src = _walk(loaded[path].get("state") or {}, parts)
            dst = _walk(state, parts)
            if src is not None and dst is not None:
                s_sub = src[0][src[1]]
                jax.tree_util.tree_map(
                    lambda a, b: None if np.shape(a) == np.shape(b) else
                    (_ for _ in ()).throw(ValueError("state shape mismatch")),
                    dst[0][dst[1]], s_sub)
                dst[0][dst[1]] = jax.tree_util.tree_map(np.asarray, s_sub)
    return params if state is None else (params, state)
