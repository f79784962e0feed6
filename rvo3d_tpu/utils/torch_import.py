"""Import reference torch checkpoints into the JAX framework.

The reference ships trained policies in two formats (multi_ppo.py:406-420):
whole-module `torch.save(self.ac)` files and `{model_state, pi_optimizer,
vf_optimizer}` state-dict checkpoints. This module converts either into the
flax parameter PyTree of rvo3d_tpu.models.ActorCritic, so reference-trained
policies run (and can be evaluated / resumed) natively here — the migration
path for users of the reference.

Whole-module files unpickle the reference classes; loading them needs
`policy.policy_rnn_ac` importable and a `gym.spaces.Box` symbol. We provide
a minimal in-memory gym stub (the real gym 0.20 isn't installable here) and
put the reference's train/ dir on sys.path for unpickling only — no
reference code is vendored.

torch name -> flax path mapping (layouts transposed; torch Linear/GRU store
[out, in], flax stores [in, out]):
  pi.rnn_reader.rnn_net.weight_ih_l0[_reverse]  -> encoder/{fwd,bwd}/w_ih.T
  pi.rnn_reader.rnn_net.weight_hh_l0[_reverse]  -> encoder/{fwd,bwd}/w_hh.T
  pi.rnn_reader.rnn_net.bias_*                  -> encoder/{fwd,bwd}/b_*
  pi.rnn_reader.ln.{weight,bias}                -> encoder/ln/{scale,bias}
  pi.net_out.{0,2,4}.{weight,bias}              -> actor/dense_{0,1,2}
  pi.log_std                                    -> log_std
  v.v_net.{0,2,4}.{weight,bias}                 -> critic/dense_{0,1,2}
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict

import numpy as np

REFERENCE_TRAIN_DIR = "/root/reference/train"


def _install_gym_stub() -> None:
    if "gym" in sys.modules:
        return
    gym = types.ModuleType("gym")
    spaces = types.ModuleType("gym.spaces")

    class Box:  # minimal unpickle target for gym.spaces.Box
        def __init__(self, low=None, high=None, shape=None, dtype=None):
            self.low, self.high, self.shape, self.dtype = low, high, shape, dtype

        def __setstate__(self, state):
            self.__dict__.update(state)

    spaces.Box = Box
    gym.spaces = spaces
    gym.Env = object
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load either checkpoint format and return a flat name->tensor dict."""
    import torch

    _install_gym_stub()
    if REFERENCE_TRAIN_DIR not in sys.path:
        sys.path.append(REFERENCE_TRAIN_DIR)

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state" in obj:
        sd = obj["model_state"]
    elif hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    else:
        sd = obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def convert_to_flax(sd: Dict[str, np.ndarray], rnn_mode: str = "biGRU"
                    ) -> Dict[str, Any]:
    """Build the {'params': ...} PyTree for ActorCritic from a reference
    state dict."""
    import jax.numpy as jnp

    def t(name):
        return jnp.asarray(sd[name])

    def mlp_params(prefix):
        out = {}
        for i, idx in enumerate((0, 2, 4)):
            out[f"dense_{i}"] = {
                "kernel": t(f"{prefix}.{idx}.weight").T,
                "bias": t(f"{prefix}.{idx}.bias"),
            }
        return out

    def gru_dir(suffix):
        return {
            "w_ih": t(f"pi.rnn_reader.rnn_net.weight_ih_l0{suffix}").T,
            "w_hh": t(f"pi.rnn_reader.rnn_net.weight_hh_l0{suffix}").T,
            "b_ih": t(f"pi.rnn_reader.rnn_net.bias_ih_l0{suffix}"),
            "b_hh": t(f"pi.rnn_reader.rnn_net.bias_hh_l0{suffix}"),
        }

    encoder = {
        "fwd": gru_dir(""),
        "ln": {
            "scale": t("pi.rnn_reader.ln.weight"),
            "bias": t("pi.rnn_reader.ln.bias"),
        },
    }
    if rnn_mode == "biGRU":
        encoder["bwd"] = gru_dir("_reverse")

    return {
        "params": {
            "encoder": encoder,
            "actor": mlp_params("pi.net_out"),
            "critic": mlp_params("v.v_net"),
            "log_std": t("pi.log_std"),
        }
    }


def load_reference_policy(path: str, rnn_mode: str = "biGRU"):
    """One-call convenience: torch checkpoint -> flax params."""
    return convert_to_flax(load_torch_state_dict(path), rnn_mode)
