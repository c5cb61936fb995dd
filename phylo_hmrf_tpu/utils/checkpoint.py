"""EM checkpoint/resume.

The reference only caches preprocessing (--reload, `phylo_hmrf.py:1676`);
EM state lives in memory and a crash loses the run (SURVEY.md section 5).
Here the full EM state — OU params, moments, warm-start label grids, RNG
state and convergence bookkeeping — checkpoints to a single npz and
`PhyloHMRF.fit(checkpoint_path=..., resume=True)` continues mid-run.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_checkpoint(path: str, model, bookkeeping: dict,
                    extra_arrays: dict | None = None) -> None:
    arrays = {
        "params_vec": model.params_vec,
        "init_ou_params": model.init_ou_params,
        "means": model.means_,
        "covars": model.covars_,
        "init_labels": model.init_labels,
    }
    for i, g in enumerate(model.labels_local):
        arrays[f"labels_local_{i}"] = g
    if extra_arrays:
        arrays.update(extra_arrays)
    meta = {
        "n_regions": len(model.labels_local),
        "rng_state": model._rng.bit_generator.state,
        "bookkeeping": {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in bookkeeping.items()},
        "config": model.cfg.to_dict(),
    }
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (arrays dict, meta dict) or None if the file is absent."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    return arrays, meta


def restore_model(model, arrays: dict, meta: dict) -> dict:
    """Load checkpoint state into the model; returns the bookkeeping dict."""
    model.params_vec = arrays["params_vec"].copy()
    model.init_ou_params = arrays["init_ou_params"].copy()
    model.means_ = arrays["means"].copy()
    model.covars_ = arrays["covars"].copy()
    model.init_labels = arrays["init_labels"].copy()
    n = meta["n_regions"]
    model.labels_local = [arrays[f"labels_local_{i}"].copy()
                          for i in range(n)]
    model._rng.bit_generator.state = meta["rng_state"]
    return meta["bookkeeping"]
