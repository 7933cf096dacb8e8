"""PyTorch checkpoint import: reference state_dicts -> flax param pytrees.

The reference pickles torch state_dicts (ego_mimic.py:133-139,
state_reg.py:91-95).  This module maps them onto our flax modules so
pretrained reference models can be evaluated in this framework
(SURVEY §5.4 checkpoint-interop requirement).

Conventions handled:
- torch Linear weight (out,in) -> flax Dense kernel (in,out)
- torch LSTMCell gates (i,f,g,o) with two bias vectors -> our LSTMCell's
  ih/hh Dense pair (same gate order, exact)
- MLP 'affine_layers.N' -> 'Dense_N'
- PolicyGaussian / Value heads incl. action_log_std (1,A) -> (A,)
"""
from __future__ import annotations

import numpy as np


def _t(w):
    return np.asarray(w).T


def _as_np(sd):
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)
    return out


def import_mlp(sd, prefix=""):
    """torch MLP (models/mlp.py: affine_layers.N) -> flax MLP params."""
    params = {}
    i = 0
    while f"{prefix}affine_layers.{i}.weight" in sd:
        params[f"Dense_{i}"] = {
            "kernel": _t(sd[f"{prefix}affine_layers.{i}.weight"]),
            "bias": np.asarray(sd[f"{prefix}affine_layers.{i}.bias"]),
        }
        i += 1
    return params


def import_linear(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def import_lstm_cell(sd, prefix):
    """torch nn.LSTMCell / GRUCell -> our cell's {ih, hh} Dense pair."""
    return {
        "ih": {"kernel": _t(sd[f"{prefix}.weight_ih"]),
               "bias": np.asarray(sd[f"{prefix}.bias_ih"])},
        "hh": {"kernel": _t(sd[f"{prefix}.weight_hh"]),
               "bias": np.asarray(sd[f"{prefix}.bias_hh"])},
    }


def import_rnn(sd, prefix, bi_dir):
    """torch RNN (models/rnn.py) -> our RNN params."""
    cell = "LSTMCell_0"  # flax auto-names the cell submodule
    params = {"rnn_f": import_lstm_cell(sd, f"{prefix}rnn_f")}
    if bi_dir:
        params["rnn_b"] = import_lstm_cell(sd, f"{prefix}rnn_b")
    return params


def import_policy_gaussian(state_dict):
    """core/policy_gaussian.py state_dict -> PolicyGaussian params."""
    sd = _as_np(state_dict)
    params = {
        "net": import_mlp(sd, "net."),
        "action_mean": import_linear(sd, "action_mean"),
        "action_log_std": np.asarray(sd["action_log_std"]).reshape(-1),
    }
    return {"params": params}


def import_value(state_dict):
    """core/critic.py state_dict -> Value params."""
    sd = _as_np(state_dict)
    return {"params": {
        "net": import_mlp(sd, "net."),
        "value_head": import_linear(sd, "value_head"),
    }}


def import_video_state_net(state_dict, bi_dir=True):
    """models/video_state_net.py (lstm variant) -> VideoStateNet params."""
    sd = _as_np(state_dict)
    return {"params": {"v_net": import_rnn(sd, "v_net.", bi_dir)}}


def import_video_forecast_net(state_dict, has_s_net=True):
    """models/video_forecast_net.py (lstm variant) -> VideoForecastNet."""
    sd = _as_np(state_dict)
    params = {"v_net": import_rnn(sd, "v_net.", bi_dir=False)}
    if has_s_net and any(k.startswith("s_net.") for k in sd):
        params["s_net"] = import_rnn(sd, "s_net.", bi_dir=False)
    return {"params": params}


def import_running_state(running_state):
    """Pickled ZFilter -> RunningStat pytree (utils/zfilter.py)."""
    import jax.numpy as jnp
    from ..ops.running_norm import RunningStat
    rs = running_state.rs if hasattr(running_state, "rs") else running_state
    return RunningStat(n=jnp.asarray(float(rs._n)),
                       mean=jnp.asarray(rs._M),
                       s=jnp.asarray(rs._S))


def import_mimic_checkpoint(model_cp, bi_dir=True):
    """Full ego-mimic checkpoint dict -> our TrainState fields."""
    return {
        "policy_dict": import_policy_gaussian(model_cp["policy_dict"]),
        "policy_vs_dict": import_video_state_net(model_cp["policy_vs_dict"],
                                                 bi_dir),
        "value_dict": import_value(model_cp["value_dict"]),
        "value_vs_dict": import_video_state_net(model_cp["value_vs_dict"],
                                                bi_dir),
        "running_state": import_running_state(model_cp["running_state"]),
    }
