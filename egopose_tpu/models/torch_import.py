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

import pickle

import numpy as np


class _Stub:
    """Attribute-bag stand-in for classes from the reference codebase that
    are not importable here (utils.zfilter.ZFilter, the Config classes).
    Pickle restores instance attributes into __dict__, so attribute access
    (zf.rs, cfg.v_hdim, ...) works without the original class."""

    def __init__(self, *a, **k):
        pass


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_Stub,), {"__module__": module})


def tolerant_pickle_load(path):
    """Load a checkpoint pickle even when it references classes defined in
    the reference repo (ZFilter, statereg Config in `meta['cfg']`): unknown
    classes resolve to attribute-bag stubs.  Torch tensors unpickle through
    the real torch (present in the environment)."""
    with open(path, "rb") as f:
        return _TolerantUnpickler(f).load()


def looks_torch_state_dict(d):
    """True for a torch-style flat state_dict (dotted keys / tensor values),
    False for our flax variables dicts ({'params': ..., 'batch_stats': ...}).
    The detection that lets the product CLIs consume reference checkpoints
    (ego_mimic.py:133-139, state_reg.py:91-95) with no flag."""
    if not isinstance(d, dict) or not d:
        return False
    if "params" in d or "batch_stats" in d:
        return False
    return any("." in k for k in d) or \
        any(hasattr(v, "detach") for v in d.values())


def cast_floats(tree, dtype):
    """Cast every floating leaf to ``dtype``.  Reference checkpoints are
    torch float64 (ego_mimic.py:31-32); the session dtype (f32 by default,
    f64 under --f64) must win or jitted scans see mixed-precision carries."""
    import jax
    import jax.numpy as jnp

    def c(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    return jax.tree_util.tree_map(c, tree)


def strip_cnn(variables):
    """Drop CNN params/stats from VideoRegNet variables (the reference's
    no_cnn strict=False load, state_reg.py save_inf)."""
    out = {}
    for coll, tree in variables.items():
        kept = {k: v for k, v in tree.items() if not k.startswith("cnn")}
        if kept:
            out[coll] = kept
    return out


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


def _conv2d_t(w):
    """torch Conv2d weight (out, in/g, kh, kw) -> flax kernel (kh, kw, in/g, out).
    Also correct for depthwise convs (groups=in): (in,1,kh,kw)->(kh,kw,1,in)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv1d_t(w):
    """torch Conv1d weight (out, in, k) -> flax kernel (k, in, out)."""
    return np.transpose(np.asarray(w), (2, 1, 0))


def import_bn(sd, key):
    """torch BatchNorm -> flax (params, batch_stats) pair."""
    params = {"scale": np.asarray(sd[f"{key}.weight"]),
              "bias": np.asarray(sd[f"{key}.bias"])}
    stats = {"mean": np.asarray(sd[f"{key}.running_mean"]),
             "var": np.asarray(sd[f"{key}.running_var"])}
    return params, stats


def import_resnet18(sd, prefix="resnet."):
    """torchvision resnet18 (wrapped by models/resnet.py with a replaced fc)
    -> our ResNet18 (params, batch_stats)."""
    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv2d_t(sd[f"{prefix}conv1.weight"])}
    params["bn1"], stats["bn1"] = import_bn(sd, f"{prefix}bn1")
    for li in range(1, 5):
        for b in range(2):
            tp = f"{prefix}layer{li}.{b}."
            bp, bs = {}, {}
            for c in ("conv1", "conv2"):
                bp[c] = {"kernel": _conv2d_t(sd[f"{tp}{c}.weight"])}
            for c in ("bn1", "bn2"):
                bp[c], bs[c] = import_bn(sd, f"{tp}{c}")
            if f"{tp}downsample.0.weight" in sd:
                bp["down_conv"] = {
                    "kernel": _conv2d_t(sd[f"{tp}downsample.0.weight"])}
                bp["down_bn"], bs["down_bn"] = import_bn(
                    sd, f"{tp}downsample.1")
            name = f"layer{li}_{b}"
            params[name], stats[name] = bp, bs
    params["fc"] = import_linear(sd, f"{prefix}fc")
    return params, stats


def import_mobile_net(sd, prefix=""):
    """models/mobile_net.py (Sequential conv_bn + 13 conv_dw + fc)
    -> our MobileNet (params, batch_stats)."""
    params, stats = {}, {}
    params["c0_conv"] = {"kernel": _conv2d_t(sd[f"{prefix}model.0.0.weight"])}
    params["c0_bn"], stats["c0_bn"] = import_bn(sd, f"{prefix}model.0.1")
    for i in range(13):
        mp = f"{prefix}model.{i + 1}."
        params[f"dw{i}_dw"] = {"kernel": _conv2d_t(sd[f"{mp}0.weight"])}
        params[f"dw{i}_dwbn"], stats[f"dw{i}_dwbn"] = import_bn(sd, f"{mp}1")
        params[f"dw{i}_pw"] = {"kernel": _conv2d_t(sd[f"{mp}3.weight"])}
        params[f"dw{i}_pwbn"], stats[f"dw{i}_pwbn"] = import_bn(sd, f"{mp}4")
    params["fc"] = import_linear(sd, f"{prefix}fc")
    return params, stats


def import_tcn(sd, prefix):
    """Weight-norm TemporalConvNet (models/tcn.py) -> our TCN params.

    torch weight_norm stores direction `weight_v` (out,in,k) + per-output-
    channel magnitude `weight_g` (out,1,1) with w = g * v/||v|| (norm over all
    dims but 0).  flax nn.WeightNorm stores the raw kernel (k,in,out) as the
    direction and a (out,)-shaped scale with the same math (norm over all axes
    but -1), so: kernel = v.T, scale = g.ravel() -- exact, not approximate.
    """
    params = {}
    i = 0
    while f"{prefix}network.{i}.conv1.weight_v" in sd:
        blk = {}
        for j, c in enumerate(("conv1", "conv2")):
            kp = f"{prefix}network.{i}.{c}"
            blk[c] = {"kernel": _conv1d_t(sd[f"{kp}.weight_v"]),
                      "bias": np.asarray(sd[f"{kp}.bias"])}
            blk[f"WeightNorm_{j}"] = {
                f"{c}/kernel/scale": np.asarray(sd[f"{kp}.weight_g"]).reshape(-1)}
        dk = f"{prefix}network.{i}.downsample"
        if f"{dk}.weight" in sd:
            blk["downsample"] = {"kernel": _conv1d_t(sd[f"{dk}.weight"]),
                                 "bias": np.asarray(sd[f"{dk}.bias"])}
        params[f"block{i}"] = blk
        i += 1
    if i == 0:
        raise KeyError(f"no TCN blocks under '{prefix}network.'")
    return params


def import_v_net(sd, prefix, v_net_type, bi_dir):
    """Temporal net of a video model: lstm or weight-norm tcn."""
    if v_net_type == "tcn":
        return import_tcn(sd, prefix)
    return import_rnn(sd, prefix, bi_dir)


def import_video_reg_net(state_dict, cnn_type="resnet", v_net_type="lstm",
                         causal=False):
    """models/video_reg_net.py state_dict -> VideoRegNet flax variables
    ({'params': ..., 'batch_stats': ...}).  Handles both full checkpoints
    (with CNN) and no_cnn inference nets (state_reg.py save_inf)."""
    sd = _as_np(state_dict)
    params, stats = {}, {}
    if any(k.startswith("cnn.") for k in sd):
        if cnn_type == "resnet":
            cp, cs = import_resnet18(sd, "cnn.resnet.")
        else:
            cp, cs = import_mobile_net(sd, "cnn.")
        params["cnn"], stats["cnn"] = cp, cs
    params["v_net"] = import_v_net(sd, "v_net.", v_net_type,
                                   bi_dir=not causal)
    params["mlp"] = import_mlp(sd, "mlp.")
    params["linear"] = import_linear(sd, "linear")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def import_statereg_checkpoint(cp, cnn_type="resnet", v_net_type="lstm",
                               causal=False):
    """Reference statereg pickle ((model_cp, meta), state_reg.py:91-95)
    -> (flax variables, mean, std)."""
    model_cp, meta = cp
    variables = import_video_reg_net(model_cp["state_net_dict"], cnn_type,
                                     v_net_type, causal)
    return variables, np.asarray(meta["mean"]), np.asarray(meta["std"])


def import_video_state_net(state_dict, bi_dir=True, v_net_type="lstm"):
    """models/video_state_net.py -> VideoStateNet params (lstm or tcn)."""
    sd = _as_np(state_dict)
    return {"params": {
        "v_net": import_v_net(sd, "v_net.", v_net_type, bi_dir)}}


def import_video_forecast_net(state_dict, has_s_net=True, v_net_type="lstm"):
    """models/video_forecast_net.py -> VideoForecastNet (lstm or tcn v_net)."""
    sd = _as_np(state_dict)
    params = {"v_net": import_v_net(sd, "v_net.", v_net_type, bi_dir=False)}
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


def import_mimic_checkpoint(model_cp, bi_dir=True, v_net_type="lstm",
                            value_v_net_type=None):
    """Full ego-mimic checkpoint dict -> our TrainState fields.

    ``value_v_net_type`` defaults to ``v_net_type`` (the shipped configs use
    the same temporal-net type for both context nets)."""
    return {
        "policy_dict": import_policy_gaussian(model_cp["policy_dict"]),
        "policy_vs_dict": import_video_state_net(model_cp["policy_vs_dict"],
                                                 bi_dir, v_net_type),
        "value_dict": import_value(model_cp["value_dict"]),
        "value_vs_dict": import_video_state_net(
            model_cp["value_vs_dict"], bi_dir,
            value_v_net_type or v_net_type),
        "running_state": import_running_state(model_cp["running_state"]),
    }


def import_forecast_checkpoint(model_cp, policy_v_net="lstm",
                               value_v_net="lstm"):
    """Full ego-forecast checkpoint dict (VideoForecastNet context nets,
    ego_forecast.py:140-147) -> our TrainState fields."""
    return {
        "policy_dict": import_policy_gaussian(model_cp["policy_dict"]),
        "policy_vs_dict": import_video_forecast_net(
            model_cp["policy_vs_dict"], v_net_type=policy_v_net),
        "value_dict": import_value(model_cp["value_dict"]),
        "value_vs_dict": import_video_forecast_net(
            model_cp["value_vs_dict"], v_net_type=value_v_net),
        "running_state": import_running_state(model_cp["running_state"]),
    }


def maybe_import_statereg(model_cp, meta, cnn_type="resnet",
                          v_net_type="lstm", causal=False, no_cnn=False):
    """(model_cp, meta) from either our flax pickles or the reference torch
    pickles (state_reg.py:91-95 / save_inf :180-184) -> (variables, mean,
    std).  With ``no_cnn`` the CNN branch is stripped so the variables fit a
    no_cnn inference net regardless of whether the source checkpoint was a
    full or an ``_inf`` one."""
    sd = model_cp["state_net_dict"]
    if looks_torch_state_dict(sd):
        variables = import_video_reg_net(sd, cnn_type, v_net_type, causal)
    else:
        variables = sd
    if no_cnn:
        variables = strip_cnn(variables)
    return variables, np.asarray(meta["mean"]), np.asarray(meta["std"])
