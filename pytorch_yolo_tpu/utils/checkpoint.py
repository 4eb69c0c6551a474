"""Native checkpoint store: parse cfg+weights once, reload as a pytree.

The reference's only persistence is the Darknet ``.weights`` binary itself
(SURVEY.md §5.4); every process start re-parses cfg + re-transposes weights.
The TPU-native equivalent persists the *converted* artifact — the folded,
HWIO-layout params pytree plus the cfg text — with Orbax, so subsequent loads
skip parsing, transposition, and BN folding entirely.

Layout of a checkpoint directory:

    <dir>/params/...    Orbax StandardCheckpointer pytree (folded params)
    <dir>/model.cfg     Darknet cfg text (the model definition language)
    <dir>/meta.json     format version + class names
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import ModelSpec, build_spec, parse_cfg_text

FORMAT_VERSION = 1


def save_checkpoint(path: str, cfg_text: str, params: dict,
                    class_names: tuple[str, ...] | None = None) -> None:
    """Persist cfg text + folded params pytree to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.cfg"), "w", encoding="utf-8") as f:
        f.write(cfg_text)
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump({"format_version": FORMAT_VERSION,
                   "class_names": list(class_names) if class_names else None}, f)
    ckptr = ocp.StandardCheckpointer()
    # orbax wants string keys
    tree = {str(k): {kk: np.asarray(vv) for kk, vv in v.items()} for k, v in params.items()}
    ckptr.save(os.path.join(path, "params"), tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str) -> tuple[ModelSpec, str, dict, tuple[str, ...] | None]:
    """Load (spec, cfg_text, params, class_names) from a checkpoint dir."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "model.cfg"), "r", encoding="utf-8") as f:
        cfg_text = f.read()
    with open(os.path.join(path, "meta.json"), "r", encoding="utf-8") as f:
        meta = json.load(f)
    if meta["format_version"] > FORMAT_VERSION:
        raise ValueError(f"checkpoint format {meta['format_version']} is newer than "
                         f"supported {FORMAT_VERSION}")
    spec = build_spec(parse_cfg_text(cfg_text))
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.join(path, "params"))
    params = {int(k): dict(v) for k, v in tree.items()}
    names = meta.get("class_names")
    return spec, cfg_text, params, tuple(names) if names else None
