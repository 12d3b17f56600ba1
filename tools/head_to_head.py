"""Reference-experiment head-to-head (VERDICT r2 #2).

Runs the reference's canonical surrogate-training experiment — 1000 Adam
iters, lr 1e-3, K=10 coefficients, first 100 frames of the semi-implicit
cavity rollout, full-horizon extrapolation (ref spectral_ode.py:140-224)
— on BOTH sides, with the SAME training npz:

  reference side: the reference's own PyTorch models + ANODE runtime on
    CPU, loop behavior replicated exactly from each driver (same loss
    `torch.norm(pred - obs)`, same Adam, same torch.save-every-10-iters
    cadence, same closed-loop extrapolation — rnn.py:86-134,
    spectral_rnn.py:135-184, spectral_ode.py:170-224,
    spectral_ode2.py:158-204)
  ns_tpu side:   ns_tpu.train.Trainer (the same protocol by construction
    — trainer.py docstring) on CPU, and again on the default platform
    (TPU when available)

Per (side, model): loss trajectory, wall-clock, and extrapolation rel-L2
over the full horizon and over the pure-extrapolation window (frames
100..nt). Individual results cached as experiments/h2h/*.json (re-running
skips completed entries); the aggregate table lands in
experiments/head_to_head.json and is pasted into RESULTS.md.

Usage: python tools/head_to_head.py [--n-iters 1000] [--models ...]
       [--sides reference ours_cpu ours_tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DATA = os.path.join(REPO, "experiments", "data_semi_implicit.npz")
OUT = os.path.join(REPO, "experiments", "h2h")

# reference driver <-> ns_tpu trainer model names
PAIRS = {
    "rnn": "rnn",
    "spectral_rnn": "basis_gru",
    "spectral_ode": "basis_ode",
    "spectral_ode2": "basis_ode2",
}


def ensure_data():
    """The shared training npz: ns_tpu chorin_fd in exact-parity mode
    (wavefront Gauss-Seidel pressure, float64 — near-bitwise to the
    reference per tests/test_chorin_fd.py), the reference's default
    semi-implicit cavity (chorin_fd/simulate.py:278-315)."""
    if os.path.exists(DATA):
        return
    os.makedirs(os.path.dirname(DATA), exist_ok=True)
    subprocess.run(
        [sys.executable, "-m", "ns_tpu.cli.run_solver", "chorin_fd",
         "--method", "semi_implicit", "--pressure-mode", "gauss_seidel",
         "--dtype", "float64", "--nt", "200", "--out", DATA],
        check=True, cwd=REPO)


sys.path.insert(0, REPO)
from ns_tpu.train.metrics import rel_l2  # noqa: E402  (one definition)


def eval_extrapolation(extrap: np.ndarray, offset: int = 0) -> dict:
    """offset=1 for the rnn family on BOTH sides: its extrapolation files
    follow the reference convention pred[t] ~ obs[t+1] (ref
    rnn.py:116-134; trainer.py extrapolate docstring), while every other
    family is frame-aligned — comparing all families aligned would
    inflate rnn error by one frame of dynamics."""
    d = np.load(DATA)
    obs = np.stack([d["u"], d["v"], d["p"]], axis=1).astype(np.float32)
    if offset:
        extrap, obs = extrap[:obs.shape[0] - offset], obs[offset:]
    n_train = 100 - offset
    return {
        "rel_l2_full": rel_l2(extrap, obs),
        "rel_l2_train_window": rel_l2(extrap[:n_train], obs[:n_train]),
        "rel_l2_extrap_window": rel_l2(extrap[n_train:], obs[n_train:]),
    }


# ---------------------------------------------------------------------------
# Reference side (PyTorch, CPU)
# ---------------------------------------------------------------------------

_REF_WORKER = r"""
import json, os, sys, time, types
import numpy as np

sys.path.insert(0, "/root/reference")
fake = types.ModuleType("torchdiffeq")
fake.odeint_adjoint = fake.odeint = None
sys.modules["torchdiffeq"] = fake

import torch
import torch.optim as optim

torch.manual_seed(0)
name, data_path, out_dir, n_iters = (sys.argv[1], sys.argv[2], sys.argv[3],
                                     int(sys.argv[4]))
os.makedirs(out_dir, exist_ok=True)

data = np.load(data_path)
u = torch.from_numpy(data['u'][:100]).float()
v = torch.from_numpy(data['v'][:100]).float()
p = torch.from_numpy(data['p'][:100]).float()
obs = torch.stack([u, v, p]).permute(1, 0, 2, 3)  # (nt, 3, nx, ny)
nt, nx, ny = obs.size(0), obs.size(2), obs.size(3)
K = 10

# model + (input, target) wiring per driver
if name == "rnn":
    from src.neural_spectral.rnn import RNN
    seq = obs.unsqueeze(0).reshape(1, nt, 3 * nx * ny)
    obs_in, obs_out = seq[:, :-1], seq[:, 1:]
    model = RNN(nx * ny * 3, 512)
    fwd = lambda: model(obs_in)[0]
    target = obs_out
else:
    mod = __import__(f"src.neural_spectral.{name}", fromlist=["PDEFunc"])
    obs5 = obs.unsqueeze(1)           # (nt, 1, 3, nx, ny)
    obs0 = obs5[0]
    t = torch.arange(nt) + 1
    model = mod.PDEFunc(K, nx, ny)
    fwd = lambda: model(obs0, t)
    target = obs5

opt = optim.Adam(model.parameters(), lr=1e-3)
losses = []
t0 = time.perf_counter()
for itr in range(1, n_iters + 1):
    opt.zero_grad()
    loss = torch.norm(fwd() - target, p=2)
    loss.backward()
    opt.step()
    losses.append(float(loss.detach()))
    if itr % 10 == 0:  # reference checkpoint cadence (spectral_ode:195)
        torch.save({'model_state_dict': model.state_dict()},
                   os.path.join(out_dir, 'checkpoint.pth.tar'))
elapsed = time.perf_counter() - t0

# full-horizon closed-loop extrapolation (ref :208-224 / rnn.py:116-134)
with torch.no_grad():
    full = np.load(data_path)
    uf = torch.from_numpy(full['u']).float()
    vf = torch.from_numpy(full['v']).float()
    pf = torch.from_numpy(full['p']).float()
    obs_f = torch.stack([uf, vf, pf]).permute(1, 0, 2, 3)
    nt_f = obs_f.size(0)
    if name == "rnn":
        seq_f = obs_f.unsqueeze(0).reshape(1, nt_f, 3 * nx * ny)
        ex = model.extrapolate(seq_f[:, 0].unsqueeze(1), nt_f)[0]
        extrap = ex.numpy().reshape(nt_f, 3, nx, ny)
    else:
        t_f = torch.arange(nt_f) + 1
        extrap = model(obs_f.unsqueeze(1)[0], t_f).squeeze(1).numpy()
np.save(os.path.join(out_dir, "extrapolation.npy"), extrap)
json.dump({"losses": losses, "seconds": elapsed},
          open(os.path.join(out_dir, "train.json"), "w"))
print("REF_DONE", name, elapsed)
"""


def run_reference(name: str, n_iters: int) -> dict:
    out_dir = os.path.join(OUT, f"reference_{name}")
    r = subprocess.run([sys.executable, "-u", "-c", _REF_WORKER, name,
                        DATA, out_dir, str(n_iters)],
                       cwd=REPO, text=True, capture_output=True)
    if r.returncode != 0:
        raise RuntimeError(f"reference {name} failed:\n{r.stdout}\n{r.stderr}")
    tr = json.load(open(os.path.join(out_dir, "train.json")))
    extrap = np.load(os.path.join(out_dir, "extrapolation.npy"))
    return {"side": "reference", "model": name, "device": "cpu",
            "n_iters": n_iters, "seconds": tr["seconds"],
            "iters_per_sec": n_iters / tr["seconds"],
            "loss_first": tr["losses"][0],
            "loss_final_avg10": float(np.mean(tr["losses"][-10:])),
            "losses_every50": tr["losses"][::50],
            **eval_extrapolation(extrap,
                                 offset=1 if name == "rnn" else 0)}


# ---------------------------------------------------------------------------
# ns_tpu side
# ---------------------------------------------------------------------------

_OURS_WORKER = r"""
import json, os, sys, time
import jax
platform = sys.argv[5]
if platform != "default":
    jax.config.update("jax_platforms", platform)
import numpy as np
from ns_tpu.train import TrainConfig, Trainer

model, data_path, out_dir, n_iters = (sys.argv[1], sys.argv[2], sys.argv[3],
                                      int(sys.argv[4]))
cfg = TrainConfig(model=model, npz_path=data_path, out_dir=out_dir,
                  n_iters=n_iters, n_coeffs=10, n_frames=100, ckpt_every=10)
tr = Trainer(cfg)
t0 = time.perf_counter()
losses = tr.train(progress=False)
elapsed = time.perf_counter() - t0
extrap = tr.extrapolate()
np.save(os.path.join(out_dir, "extrapolation.npy"), np.asarray(extrap))
json.dump({"losses": [float(x) for x in losses], "seconds": elapsed},
          open(os.path.join(out_dir, "train.json"), "w"))
print("OURS_DONE", model, elapsed)
"""


def run_ours(model: str, n_iters: int, platform: str) -> dict:
    tag = "tpu" if platform == "default" else platform
    out_dir = os.path.join(OUT, f"ours_{tag}_{model}")
    os.makedirs(out_dir, exist_ok=True)
    r = subprocess.run([sys.executable, "-u", "-c", _OURS_WORKER, model,
                        DATA, out_dir, str(n_iters), platform],
                       cwd=REPO, text=True, capture_output=True)
    if r.returncode != 0:
        raise RuntimeError(f"ns_tpu {model} ({tag}) failed:\n"
                           f"{r.stdout}\n{r.stderr}")
    tr = json.load(open(os.path.join(out_dir, "train.json")))
    extrap = np.load(os.path.join(out_dir, "extrapolation.npy"))
    return {"side": f"ns_tpu_{tag}", "model": model, "device": tag,
            "n_iters": n_iters, "seconds": tr["seconds"],
            "iters_per_sec": n_iters / tr["seconds"],
            "loss_first": tr["losses"][0],
            "loss_final_avg10": float(np.mean(tr["losses"][-10:])),
            "losses_every50": tr["losses"][::50],
            **eval_extrapolation(extrap,
                                  offset=1 if model == "rnn" else 0)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-iters", type=int, default=1000)
    ap.add_argument("--models", nargs="*", default=list(PAIRS))
    ap.add_argument("--sides", nargs="*",
                    default=["reference", "ours_cpu", "ours_tpu"])
    args = ap.parse_args(argv)

    ensure_data()
    os.makedirs(OUT, exist_ok=True)
    for ref_name in args.models:
        ours_name = PAIRS[ref_name]
        jobs = []
        if "reference" in args.sides:
            jobs.append(("reference", ref_name,
                         lambda rn=ref_name: run_reference(rn, args.n_iters)))
        if "ours_cpu" in args.sides:
            jobs.append(("ours_cpu", ours_name,
                         lambda on=ours_name: run_ours(on, args.n_iters,
                                                       "cpu")))
        if "ours_tpu" in args.sides:
            jobs.append(("ours_tpu", ours_name,
                         lambda on=ours_name: run_ours(on, args.n_iters,
                                                       "default")))
        for side, mname, job in jobs:
            cache = os.path.join(OUT, f"result_{side}_{mname}.json")
            rec = (json.load(open(cache)) if os.path.exists(cache)
                   else None)
            # a cache hit is only valid for the SAME iteration count —
            # otherwise a smoke run's rows silently pollute the table
            if rec is not None and rec.get("n_iters") == args.n_iters:
                print(f"cached: {side}/{mname}")
            else:
                print(f"running: {side}/{mname} ...", flush=True)
                t0 = time.perf_counter()
                rec = job()
                print(f"  done in {time.perf_counter() - t0:.0f}s "
                      f"(train {rec['seconds']:.0f}s, final loss "
                      f"{rec['loss_final_avg10']:.1f}, extrap rel-L2 "
                      f"{rec['rel_l2_extrap_window']:.3f})", flush=True)
                json.dump(rec, open(cache, "w"), indent=1)

    # aggregate EVERY cached result (not just this invocation's selection)
    # so partial re-runs refresh rows without dropping the rest
    order = {}
    for i, (ref_name, ours_name) in enumerate(PAIRS.items()):
        order[ref_name] = i
        order[ours_name] = i
    sides = {"reference": 0, "ns_tpu_cpu": 1, "ns_tpu_tpu": 2}
    results = sorted(
        (json.load(open(os.path.join(OUT, f)))
         for f in os.listdir(OUT) if f.startswith("result_")),
        key=lambda r: (order.get(r["model"], 99), sides.get(r["side"], 9)))
    agg = os.path.join(REPO, "experiments", "head_to_head.json")
    json.dump(results, open(agg, "w"), indent=1)
    print(f"\nwrote {agg}\n")
    print("| model | side | iters | seconds | final loss | rel-L2 (train) "
          "| rel-L2 (extrap) |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['model']} | {r['side']} | {r.get('n_iters', '?')} "
              f"| {r['seconds']:.0f} "
              f"| {r['loss_final_avg10']:.1f} "
              f"| {r['rel_l2_train_window']:.3f} "
              f"| {r['rel_l2_extrap_window']:.3f} |")


if __name__ == "__main__":
    main()
