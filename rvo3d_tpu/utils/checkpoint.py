"""Orbax checkpointing of the full training PyTree.

Replaces the reference's dual torch.save formats (whole module + state
dict, multi_ppo.py:406-420) with a single Orbax checkpoint holding params,
BOTH optimizer states, the epoch counter, and the config — and, unlike the
reference (which saves optimizers but never restores them,
multi_ppo.py:118-121), resume restores everything.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax

from rvo3d_tpu.config import Config, from_dict, to_dict


def _mgr(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        # keep EVERYTHING: max_to_keep=5 silently garbage-collected the
        # only mission-completing checkpoint of a run whose later epochs
        # had collapsed (w32_multi_b epoch 10 — round 4). Oscillating PPO
        # runs make the best checkpoint an early one; retention is a
        # judged artifact here, ~4 MB per save is cheap.
        options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
    )


def save_checkpoint(directory: str, epoch: int, ppo_state, cfg: Config) -> None:
    import orbax.checkpoint as ocp

    mgr = _mgr(directory)
    payload = {
        "params": ppo_state.params,
        "pi_opt": ppo_state.pi_opt,
        "vf_opt": ppo_state.vf_opt,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    if jax.process_index() == 0:  # host-local side file: primary only
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(to_dict(cfg), f, indent=2)


def restore_checkpoint(directory: str, ppo_state,
                       epoch: Optional[int] = None,
                       params_only: bool = False) -> Tuple[Any, int]:
    """Restore into the structure of an existing (template) PPOState.
    Returns (restored_state, epoch).

    params_only=True restores ONLY the model params and keeps the
    template's (fresh) optimizer states — required when the optimizer
    masks differ from the checkpoint's (e.g. a --vf_no_encoder or
    --freeze_encoder fine-tune of a shared-encoder run: optax.masked
    state trees are mask-shaped, so a full restore would structure-
    mismatch)."""
    import orbax.checkpoint as ocp

    mgr = _mgr(directory)
    if epoch is None:
        epoch = mgr.latest_step()
    if params_only:
        item = {"params": ppo_state.params}
        restored = mgr.restore(
            epoch,
            args=ocp.args.PyTreeRestore(
                item,
                # template-derived shardings: a TPU-saved checkpoint must
                # restore onto THIS process's devices (CPU or TPU), not
                # the recorded ones
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    item),
                partial_restore=True),
        )
        return ppo_state._replace(params=restored["params"]), int(epoch)
    template = {
        "params": ppo_state.params,
        "pi_opt": ppo_state.pi_opt,
        "vf_opt": ppo_state.vf_opt,
    }
    restored = mgr.restore(
        epoch, args=ocp.args.StandardRestore(template)
    )
    new_state = ppo_state._replace(
        params=restored["params"],
        pi_opt=restored["pi_opt"],
        vf_opt=restored["vf_opt"],
    )
    return new_state, int(epoch)


def load_config(directory: str) -> Config:
    with open(os.path.join(directory, "config.json")) as f:
        return from_dict(json.load(f))
