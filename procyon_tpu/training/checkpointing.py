"""Checkpoint save/restore (orbax) + training-state snapshots.

Replaces the reference's DeepSpeed checkpoint machinery
(trainIT.py:1825-1889 _save_checkpoint_deepspeed/_load_from_checkpoint_
deepspeed, model_unified.py:1295-1542 from_pretrained/zero_to_fp32):
  * checkpoint-{step}/ dirs with params + optimizer state saved sharded via
    orbax (GSPMD arrays restore with their shardings — the ZeRO-stage
    cross-load problem disappears);
  * config/args snapshot saved as JSON next to the arrays (the reference
    pickles dataclasses into model_args.pt — JSON is portable and
    torch-free);
  * training_state.json holds step, mixer state, and per-task progress for
    exact resume (trainIT.py training_progress + DistributedSamplerResume);
  * best_model_checkpoint marker for early stopping (trainIT.py:1794-1822).
"""

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, Optional



def _config_to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _config_to_jsonable(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_config_to_jsonable(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _config_to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, type):
        return obj.__name__
    if hasattr(obj, "dtype") and hasattr(obj, "shape"):
        return repr(obj)
    if callable(obj):
        return getattr(obj, "__name__", repr(obj))
    return obj


def checkpoint_dir(base: str, step: int) -> str:
    return os.path.join(base, f"checkpoint-{step}")


def save_checkpoint(base: str, step: int, state: Dict, *,
                    configs: Optional[Dict[str, Any]] = None,
                    training_state: Optional[Dict] = None,
                    keep_last: int = 0) -> str:
    """Save {params, opt_state, step} sharded + JSON sidecars."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(checkpoint_dir(base, step))
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state)
    ckptr.wait_until_finished()
    if configs:
        with open(os.path.join(path, "configs.json"), "w") as f:
            json.dump({k: _config_to_jsonable(v) for k, v in configs.items()},
                      f, indent=2, default=str)
    if training_state is not None:
        with open(os.path.join(path, "training_state.json"), "w") as f:
            json.dump(training_state, f, indent=2)
    if keep_last:
        prune_checkpoints(base, keep_last)
    return path


def list_checkpoints(base: str):
    if not os.path.isdir(base):
        return []
    steps = []
    for d in os.listdir(base):
        if d.startswith("checkpoint-"):
            try:
                steps.append(int(d.split("-", 1)[1]))
            except ValueError:
                pass
    return sorted(steps)


def prune_checkpoints(base: str, keep_last: int):
    steps = list_checkpoints(base)
    best = best_checkpoint_step(base)
    for s in steps[:-keep_last] if keep_last else []:
        if s != best:
            shutil.rmtree(checkpoint_dir(base, s), ignore_errors=True)


def latest_checkpoint(base: str) -> Optional[str]:
    steps = list_checkpoints(base)
    return checkpoint_dir(base, steps[-1]) if steps else None


def restore_checkpoint(path: str, abstract_state: Dict) -> Dict:
    """Restore into the shape/sharding skeleton of `abstract_state`
    (produce it with jax.eval_shape + shardings, or pass a live state)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                         abstract_state)


def load_training_state(path: str) -> Optional[Dict]:
    p = os.path.join(path, "training_state.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def mark_best(base: str, step: int):
    with open(os.path.join(base, "best_model_checkpoint"), "w") as f:
        f.write(str(step))


def best_checkpoint_step(base: str) -> Optional[int]:
    p = os.path.join(base, "best_model_checkpoint")
    if os.path.exists(p):
        with open(p) as f:
            return int(f.read().strip())
    return None


def peek_resume_state(base: str):
    """Training-state of the latest checkpoint (None if no checkpoint) —
    lets callers rebuild data streams at the right position BEFORE
    constructing the trainer."""
    path = latest_checkpoint(base)
    return load_training_state(path) if path else None
