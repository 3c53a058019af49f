"""Import reference-format MAVAE parameters into the stacked layout.

Migration surface: the reference pickles its flax param pytree
(jax_ver/main.py:239-240, ``pickle.dump(train_state.params)``) whose
structure follows jax_ver/model.py — per-agent submodule dicts auto-named
``encoders_<agent>`` / ``action_encoders_<agent>`` (Encoder hidden layers
named ``fc{i}`` + one unnamed output Dense -> ``Dense_0``), joint
``state_decoder`` / ``reward_decoder`` (all-unnamed Denses ->
``Dense_0..Dense_N``), an ``idx_emb`` embedding table, and the
``reward_linear`` head.  This module restacks that tree into this
framework's grouped layout (one ``encoders_{g}`` StackedMLP per
(obs_dim, act_dim) group, leading agent axis) so a checkpoint trained with
the reference code runs here unchanged.

Target layout requires ``fused_decoders=False`` (the reference's separate
state/reward decoder parameter structure).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from mfvae_tpu.models.mavae import AgentSpec


def _unwrap(tree: Dict[str, Any]) -> Dict[str, Any]:
    return tree["params"] if "params" in tree and "idx_emb" not in tree else tree


def _ordered_dense_names(module_tree: Dict[str, Any]) -> list:
    """Reference MLP layer order: named fc0..fcN hiddens first (Encoder),
    then auto-named Dense_0..Dense_M (the unnamed layers, in creation
    order)."""
    fcs = sorted(
        (k for k in module_tree if k.startswith("fc")), key=lambda s: int(s[2:])
    )
    denses = sorted(
        (k for k in module_tree if k.startswith("Dense_")),
        key=lambda s: int(s.split("_")[1]),
    )
    return fcs + denses


def _map_mlp(module_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Reference MLP module -> this framework's {fc0..fcN, out} naming."""
    names = _ordered_dense_names(module_tree)
    out = {}
    for i, name in enumerate(names):
        ours = "out" if i == len(names) - 1 else f"fc{i}"
        out[ours] = {
            "kernel": jnp.asarray(module_tree[name]["kernel"]),
            "bias": jnp.asarray(module_tree[name]["bias"]),
        }
    return out


def import_reference_params(ref_tree: Dict[str, Any], spec: AgentSpec) -> Dict[str, Any]:
    """Restack a reference MAVAE param pytree into the grouped layout.

    ``ref_tree``: the object the reference pickles (``train_state.params``,
    with or without the top-level ``params`` key).  Returns a ``{"params":
    ...}`` variables dict for ``MAVAE.from_config(cfg, spec)`` with
    ``fused_decoders=False`` and matching widths."""
    p = _unwrap(ref_tree)
    out: Dict[str, Any] = {
        "idx_emb": {"embedding": jnp.asarray(p["idx_emb"]["embedding"])},
        "reward_linear": {
            "kernel": jnp.asarray(p["reward_linear"]["kernel"]),
            "bias": jnp.asarray(p["reward_linear"]["bias"]),
        },
    }
    for dec in ("state_decoder", "reward_decoder"):
        out[dec] = _map_mlp(p[dec])

    for g, ((_, _), idxs) in enumerate(spec.groups):
        names = [spec.agents[i] for i in idxs]
        ref0 = p[f"encoders_{names[0]}"]
        layer_names = _ordered_dense_names(ref0)
        enc: Dict[str, Any] = {}
        for i, ref_name in enumerate(layer_names):
            ours = "out" if i == len(layer_names) - 1 else f"fc{i}"
            enc[ours] = {
                "kernel": jnp.stack(
                    [np.asarray(p[f"encoders_{a}"][ref_name]["kernel"]) for a in names]
                ),
                "bias": jnp.stack(
                    [np.asarray(p[f"encoders_{a}"][ref_name]["bias"]) for a in names]
                ),
            }
        out[f"encoders_{g}"] = enc

        a0 = p[f"action_encoders_{names[0]}"]
        if "embedding" in a0:  # discrete actions (reference Embedding)
            out[f"action_encoders_{g}"] = {
                "embedding": jnp.stack(
                    [
                        np.asarray(p[f"action_encoders_{a}"]["embedding"])
                        for a in names
                    ]
                )
            }
        else:  # continuous ActionEncoder MLP
            layer_names = _ordered_dense_names(a0)
            mod: Dict[str, Any] = {}
            for i, ref_name in enumerate(layer_names):
                ours = "out" if i == len(layer_names) - 1 else f"fc{i}"
                mod[ours] = {
                    "kernel": jnp.stack(
                        [
                            np.asarray(p[f"action_encoders_{a}"][ref_name]["kernel"])
                            for a in names
                        ]
                    ),
                    "bias": jnp.stack(
                        [
                            np.asarray(p[f"action_encoders_{a}"][ref_name]["bias"])
                            for a in names
                        ]
                    ),
                }
            out[f"action_encoders_{g}"] = mod
    return {"params": out}


def load_reference_pickle(path: str, spec: AgentSpec) -> Dict[str, Any]:
    """Load the reference's ``model_state.pkl`` (jax_ver/main.py:239-240)
    and restack it."""
    with open(path, "rb") as f:
        tree = pickle.load(f)
    return import_reference_params(tree, spec)


# ------------------------------------------------------------------ export
def _np_tree(x):
    return {k: np.asarray(v) for k, v in x.items()}


def _unstack_mlp_to_ref(module_tree: Dict[str, Any], row: Optional[int],
                        hidden_names_fc: bool) -> Dict[str, Any]:
    """This framework's MLP/StackedMLP tree ({fc0..fcN, out}) -> the
    reference's flax auto-naming.  ``row`` slices the leading stack axis
    (None for unstacked).  ``hidden_names_fc``: the reference Encoder names
    its hiddens fc{i} and leaves only the output unnamed (-> Dense_0,
    jax_ver/model.py:19-22); Decoder/ActionEncoder leave every layer
    unnamed (-> Dense_0..Dense_N, model.py:44-47,71-76)."""
    fcs = sorted(
        (k for k in module_tree if k.startswith("fc")), key=lambda s: int(s[2:])
    )
    out: Dict[str, Any] = {}
    take = (lambda a: np.asarray(a)) if row is None else (
        lambda a: np.asarray(a[row])
    )
    for i, name in enumerate(fcs):
        ref_name = f"fc{i}" if hidden_names_fc else f"Dense_{i}"
        out[ref_name] = {
            "kernel": take(module_tree[name]["kernel"]),
            "bias": take(module_tree[name]["bias"]),
        }
    last = "Dense_0" if hidden_names_fc else f"Dense_{len(fcs)}"
    out[last] = {
        "kernel": take(module_tree["out"]["kernel"]),
        "bias": take(module_tree["out"]["bias"]),
    }
    return out


def export_reference_params(
    variables: Dict[str, Any], spec: AgentSpec
) -> Dict[str, Any]:
    """Restack this framework's grouped MAVAE params into the REFERENCE's
    per-agent pytree — the exact structure ``pickle.dump(train_state.params)``
    writes at jax_ver/main.py:239-240 — making checkpoint interop
    bidirectional (inverse of :func:`import_reference_params`).

    Handles both decoder layouts: ``fused_decoders=False`` maps
    state_decoder/reward_decoder directly; ``fused_decoders=True`` unstacks
    the shared trunk (stack 0 = state, 1 = reward, mavae.MAVAE.decode) and
    re-attaches each output head as the reference's final Dense.

    Only the reference's architecture is representable: ``det_features`` or
    ``latent_structure='shared_private'`` widen the encoder output beyond
    ``2*obs_features``, which the reference encoder tree cannot express —
    detected from the param shapes and rejected.  (Width parity with the
    reference's hardcoded hidden lists, jax_ver/model.py:15,39,67, is the
    caller's concern: the pickle stores bare arrays.)"""
    p = variables.get("params", variables)
    out: Dict[str, Any] = {
        "idx_emb": {"embedding": np.asarray(p["idx_emb"]["embedding"])},
        "reward_linear": _np_tree(p["reward_linear"]),
    }

    if "state_decoder" in p:
        for dec in ("state_decoder", "reward_decoder"):
            out[dec] = _unstack_mlp_to_ref(p[dec], None, hidden_names_fc=False)
    else:  # fused trunk: [2, in, out] kernels; heads close each decoder
        trunk = p["decoder_trunk"]
        for row, (dec, head) in enumerate(
            (("state_decoder", "state_head"), ("reward_decoder", "reward_head"))
        ):
            tree = _unstack_mlp_to_ref(trunk, row, hidden_names_fc=False)
            n_layers = len(tree)
            tree[f"Dense_{n_layers}"] = _np_tree(p[head])
            out[dec] = tree

    # encoder output must be exactly 2*obs_features: infer obs_features from
    # the decoder input width ((obs_f + act_f) * n  vs  encoder out)
    for g, ((_, _), idxs) in enumerate(spec.groups):
        names = [spec.agents[i] for i in idxs]
        enc = p[f"encoders_{g}"]
        for pos, a in enumerate(names):
            out[f"encoders_{a}"] = _unstack_mlp_to_ref(
                enc, pos, hidden_names_fc=True
            )
        ae = p[f"action_encoders_{g}"]
        if "embedding" in ae:  # discrete: stacked embedding [A_g, n_act, F]
            for pos, a in enumerate(names):
                out[f"action_encoders_{a}"] = {
                    "embedding": np.asarray(ae["embedding"][pos])
                }
        else:
            for pos, a in enumerate(names):
                out[f"action_encoders_{a}"] = _unstack_mlp_to_ref(
                    ae, pos, hidden_names_fc=False
                )

    enc_out = out[f"encoders_{spec.agents[0]}"]["Dense_0"]["kernel"].shape[1]
    act_f = out[f"action_encoders_{spec.agents[0]}"]
    act_f = (
        act_f["embedding"].shape[-1]
        if "embedding" in act_f
        else act_f[sorted(act_f)[-1]]["kernel"].shape[1]
    )
    dec_in = out["state_decoder"]["Dense_0"]["kernel"].shape[0]
    obs_f = dec_in // spec.n_agents - act_f
    if enc_out != 2 * obs_f:
        raise ValueError(
            "model is not reference-representable: encoder output width "
            f"{enc_out} != 2*obs_features ({2 * obs_f}) — det_features / "
            "shared_private latents have no reference counterpart"
        )
    return out


def save_reference_pickle(
    variables: Dict[str, Any], spec: AgentSpec, path: str
) -> None:
    """Write ``model_state.pkl`` exactly as the reference does
    (jax_ver/main.py:239-240: the bare params dict, no 'params' wrapper)."""
    tree = export_reference_params(variables, spec)
    with open(path, "wb") as f:
        pickle.dump(tree, f)


# --------------------------------------------------------------- torch side
def _torch_sequential_mlp(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch_ver Decoder/Encoder are nn.Sequential(Linear, ReLU, ...) —
    Linears sit at even indices (``{prefix}.net.0.weight`` ...).  torch
    Linear weights are [out, in]; flax kernels are [in, out]."""
    idxs = sorted(
        {
            int(k.split(".")[-2])
            for k in sd
            if k.startswith(f"{prefix}.net.") and k.endswith(".weight")
        }
    )
    out = {}
    for i, li in enumerate(idxs):
        ours = "out" if i == len(idxs) - 1 else f"fc{i}"
        out[ours] = {
            "kernel": jnp.asarray(np.asarray(sd[f"{prefix}.net.{li}.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.net.{li}.bias"])),
        }
    return out


def import_torch_state_dict(
    state_dict: Dict[str, Any], init_variables: Dict[str, Any]
) -> tuple:
    """Import the torch reference's saved ``state_dict``
    (torch_ver/model.py:175-176) on top of freshly-initialized variables.

    IMPORTANT reference caveat (SURVEY §2.1): torch_ver stores its per-agent
    encoders and action encoders in plain Python dicts, so they are
    invisible to ``state_dict()`` — the saved file genuinely lacks them.
    This importer transfers everything the target model can hold — the idx
    embedding, both joint decoders (state/reward), and the PopArt
    ``reward_linear`` head.  The reference also saves a legacy joint
    ``decoder`` (constructed but unused, torch_ver/model.py:134); MAVAE has
    no corresponding module, so it is reported rather than transferred.

    Accepts a dict of arrays/tensors (call ``.numpy()``-able); returns
    (variables, skipped_names): target modules left at their initialization
    (the unsaved encoders) plus ``unmapped:<prefix>`` entries for saved
    modules with no target (e.g. the legacy decoder), so callers can warn
    precisely."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)()) for k, v in state_dict.items()}
    params = dict(init_variables["params"])

    if "idx_emb.weight" in sd:
        params["idx_emb"] = {"embedding": jnp.asarray(sd["idx_emb.weight"])}
    for dec in ("state_decoder", "reward_decoder"):
        if any(k.startswith(f"{dec}.net.") for k in sd):
            params[dec] = _torch_sequential_mlp(sd, dec)
    if "reward_linear.weight" in sd:
        params["reward_linear"] = {
            "kernel": jnp.asarray(sd["reward_linear.weight"].T),
            "bias": jnp.asarray(sd["reward_linear.bias"]),
        }
    missing = sorted(
        k for k in init_variables["params"]
        if (k.startswith("encoders_") or k.startswith("action_encoders_"))
    )
    mapped = ("idx_emb", "state_decoder", "reward_decoder", "reward_linear")
    unmapped = sorted({k.split(".")[0] for k in sd} - set(mapped))
    missing += [f"unmapped:{m}" for m in unmapped]
    return {"params": params}, missing


def load_torch_checkpoint(
    path: str, init_variables: Dict[str, Any]
) -> tuple:
    """Load the torch reference's ``test.pt`` (torch_ver/main.py:111-112)
    via torch.load and import it.  Returns (variables, missing_modules)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return import_torch_state_dict(sd, init_variables)
