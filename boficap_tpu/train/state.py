"""Train state + checkpointing (parity with reference utils/misc.py:87-102
save_checkpoint and tools/train.py:62-78 resume).

Checkpoint layout under <checkpoint_path>/:
  model<app>.ckpt       flax-serialized params        (= model.pth)
  optimizer<app>.ckpt   flax-serialized opt_state     (= optimizer.pth)
  infos_<id><app>.pkl   iter/epoch/loader state/vocab/opt/best_val_score
  histories_<id><app>.pkl loss/lr/val time series

``append`` in {'', 'best', '<iter>'} exactly like the reference.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization
from flax import struct
import optax


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int

    def apply_gradients(self, tx, grads):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return TrainState(params=new_params, opt_state=new_opt,
                          step=self.step + 1)


def create_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=0)


def _atomic_write(path: str, data: bytes):
    """Serialize-then-rename so a failure mid-save (e.g. reading donated
    device buffers after a crash mid-step) can never truncate an existing
    good checkpoint file."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(cfg, state: TrainState, infos: Dict, histories: Dict,
                    append: str = ""):
    app = ("_" + str(append)) if append else ""
    path = cfg.checkpoint_path
    os.makedirs(path, exist_ok=True)
    # materialize EVERY payload before touching any file: the train steps
    # donate their state, so state.params can be unreadable after a crash
    # mid-step — fail here, with the old files intact
    payloads = [
        (f"model{app}.ckpt", serialization.to_bytes(state.params)),
        (f"optimizer{app}.ckpt", serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, state.opt_state))),
        (f"infos_{cfg.id}{app}.pkl", pickle.dumps(infos)),
        (f"histories_{cfg.id}{app}.pkl", pickle.dumps(histories)),
    ]
    for name, data in payloads:
        _atomic_write(os.path.join(path, name), data)


def load_params(path: str, template) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_infos(start_from: str, cfg_id: str, append: str = "") -> Dict:
    app = ("_" + str(append)) if append else ""
    with open(os.path.join(start_from, f"infos_{cfg_id}{app}.pkl"),
              "rb") as f:
        return pickle.load(f)


def load_histories(start_from: str, cfg_id: str) -> Dict:
    p = os.path.join(start_from, f"histories_{cfg_id}.pkl")
    if os.path.exists(p):
        with open(p, "rb") as f:
            return pickle.load(f)
    return {}


def resume_state(cfg, state: TrainState) -> TrainState:
    """Restore params + opt_state from <start_from> (train.py:87-92,117-118)."""
    sf = cfg.get("start_from")
    if not sf:
        return state
    params = load_params(os.path.join(sf, "model.ckpt"), state.params)
    opt_path = os.path.join(sf, "optimizer.ckpt")
    opt_state = state.opt_state
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            try:
                opt_state = serialization.from_bytes(opt_state, f.read())
            except ValueError as e:
                # optimizer TYPE changed between stages (e.g. XE under noam
                # inject_hyperparams -> RL under a plain schedule): optax
                # bakes the schedule into opt_state, so the structures don't
                # match.  The reference's NoamOpt wraps OUTSIDE optimizer.pth
                # (misc.py:160-199), making its stage-2 resume effectively a
                # fresh-schedule start — do the same here.
                print(f"optimizer.ckpt structure mismatch ({e}); "
                      f"starting stage with a fresh optimizer state")
    return TrainState(params=params, opt_state=opt_state, step=state.step)


def encoder_only_init(params, donor_params):
    """--init_from warm start: copy ONLY the encoder (+att_embed) subtree
    from an AR checkpoint (reference CaptionModel.init_from, key remapping at
    CaptionModel.py:475-479 keeps encoder/src_embed weights)."""
    import flax
    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    new = jax.tree_util.tree_map(lambda x: x, p)
    for key in ("encoder", "att_embed"):
        if key in donor_params.get("params", donor_params) and \
           key in new.get("params", new):
            tgt = new["params"] if "params" in new else new
            src = donor_params["params"] if "params" in donor_params else donor_params
            tgt[key] = src[key]
    return new
