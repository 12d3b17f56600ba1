"""Aux subsystem tests: guards, ensemble sharding, JSONL logging, timing."""

import pytest
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.parallel import make_mesh
from ns_tpu.parallel.ensemble import (ensemble_energy, ensemble_init,
                                      ensemble_rollout_final)
from ns_tpu.solvers import spectral_periodic as sp
from ns_tpu.utils.guard import guarded_rollout, state_is_bad
from ns_tpu.utils.jsonl import JSONLLogger
from ns_tpu.utils.profiling import timed


def test_state_is_bad():
    good = {"u": jnp.ones((3, 3))}
    assert not bool(state_is_bad(good))
    assert bool(state_is_bad({"u": jnp.array([jnp.nan])}))
    assert bool(state_is_bad({"u": jnp.array([1e9])}))


def test_guarded_rollout_freezes_on_divergence():
    # doubling map from 1.0: after step index n the value is 2^(n+1);
    # 128 > 100 first happens at step index 6
    step = lambda s: 2.0 * s
    final, states = guarded_rollout(step, jnp.asarray(1.0), nt=12,
                                    max_abs=100.0)
    assert bool(final.bad)
    assert int(final.first_bad_step) == 6
    # frozen at last good value (2^6 = 64)
    assert float(final.state) == 64.0
    # collected rollout holds the frozen value after the trip
    assert float(states[-1]) == 64.0


def test_guarded_rollout_clean_path():
    step = lambda s: 0.5 * s
    final, _ = guarded_rollout(step, jnp.asarray(1.0), nt=5)
    assert not bool(final.bad)
    assert int(final.first_bad_step) == -1
    np.testing.assert_allclose(float(final.state), 0.5**5)


def test_ensemble_sharded_rollout_matches_unsharded():
    cfg = sp.SpectralPeriodicConfig(nt=10, nx=32, ny=32, dt=0.005, nu=1e-3,
                                    dtype="float64")
    B = 8
    w0s = np.stack([np.asarray(sp.decaying_turbulence_vorticity(cfg, seed=i))
                    for i in range(B)])
    mesh = make_mesh({"ensemble": 8})
    carry = ensemble_init(cfg, w0s, mesh)
    w_hat, _ = ensemble_rollout_final(cfg, carry)
    assert w_hat.shape[0] == B

    # per-trajectory unsharded reference
    c0 = sp.init_from_vorticity(cfg, w0s[3])
    w_ref, _ = sp.rollout_final(cfg, c0)
    np.testing.assert_allclose(np.asarray(w_hat[3]), np.asarray(w_ref),
                               atol=1e-10)

    e = ensemble_energy(cfg, w_hat)
    assert np.isfinite(float(e)) and float(e) > 0


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with JSONLLogger(path) as log:
        log.log({"loss": 1.5}, step=1)
        log.log({"loss": jnp.asarray(0.5)}, step=2)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 2


def test_timed_blocks():
    f = jax.jit(lambda x: x * 2)
    secs, out = timed(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert secs > 0 and out.shape == (8, 8)


def test_sanity_cli_runs():
    from ns_tpu.cli.sanity import main
    main(["--n", "33"])


def test_stream_rollout_matches_in_memory(tmp_path):
    """Chunked streaming writer produces byte-identical frames to the
    in-memory stacked rollout (incl. a non-divisible remainder chunk)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ns_tpu.io.streaming import stream_rollout
    from ns_tpu.solvers import spectral_periodic as sp

    cfg = sp.SpectralPeriodicConfig(nt=11, nx=16, ny=16, dt=1e-3, nu=1e-3)
    w0 = sp.taylor_green_vorticity(cfg)
    carry0 = sp.init_from_vorticity(cfg, w0)
    step, _ = sp.make_step(cfg)

    def step_fn(carry):
        new_carry, _ = step(carry)
        return new_carry

    def extract(carry):
        return {"w": jnp.fft.irfft2(carry[0], s=(cfg.nx, cfg.ny))}

    paths = stream_rollout(step_fn, carry0, cfg.nt, extract,
                           str(tmp_path / "roll"), chunk=4)
    w_stream = np.load(paths["w"])
    assert w_stream.shape == (cfg.nt, cfg.nx, cfg.ny)

    w_hats = jax.jit(lambda c: sp.simulate_hat(cfg, c))(carry0)
    w_ref = np.asarray(jax.vmap(
        lambda h: jnp.fft.irfft2(h, s=(cfg.nx, cfg.ny)))(w_hats))
    np.testing.assert_allclose(w_stream, w_ref.astype(np.float32), rtol=1e-6)


def test_run_solver_cli_streaming_and_flags(tmp_path, monkeypatch):
    """CLI: --stream-dir streams the turbulence rollout; --pressure-mode cg
    and --transform matmul --compact are reachable."""
    import numpy as np
    from ns_tpu.cli.run_solver import main as run_main

    monkeypatch.chdir(tmp_path)
    run_main(["decaying_turbulence", "--nx", "16", "--nt", "7",
              "--transform", "matmul", "--compact", "--precision", "highest",
              "--stream-dir", str(tmp_path / "stream")])
    # the streamed contract is the reference simulate() triple + vorticity
    for name in ("u", "v", "p", "w"):
        a = np.load(tmp_path / "stream" / f"{name}.npy")
        assert a.shape == (7, 16, 16) and np.isfinite(a).all(), name

    run_main(["chorin_fd", "--nx", "17", "--nt", "2", "--nit", "50",
              "--pressure-mode", "cg", "--out", str(tmp_path / "cg.npz")])
    d = np.load(tmp_path / "cg.npz")
    assert np.isfinite(d["u"]).all()


def test_run_solver_cli_guard(tmp_path, capsys):
    """--guard: an unstable config freezes at the last good step, reports
    the first bad step index, and still writes a fully-finite npz."""
    import numpy as np
    from ns_tpu.cli.run_solver import main as run_main

    out = tmp_path / "guarded.npz"
    # explicit chorin at an unstable dt blows up within a few steps
    run_main(["chorin_fd", "--nx", "33", "--nt", "30", "--nit", "50",
              "--method", "explicit", "--dt", "0.2", "--guard",
              "--out", str(out)])
    captured = capsys.readouterr().out
    assert "guard: divergence at step" in captured
    d = np.load(out)
    for k in ("u", "v", "p"):
        assert d[k].shape == (30, 33, 33)
        assert np.isfinite(d[k]).all(), k


def test_run_solver_cli_guard_clean_run(tmp_path, capsys):
    """--guard on a stable config is a no-op (no trip message, same
    fields)."""
    import numpy as np
    from ns_tpu.cli.run_solver import main as run_main

    out = tmp_path / "clean.npz"
    run_main(["chorin_fd", "--nx", "17", "--nt", "3", "--nit", "50",
              "--pressure-mode", "dst", "--guard", "--out", str(out)])
    assert "guard: divergence" not in capsys.readouterr().out
    d = np.load(out)
    assert np.isfinite(d["u"]).all()


def test_run_solver_cli_streams_fd_families(tmp_path):
    """--stream-dir also streams the cavity families' rollouts (u/v/p
    memmaps matching the in-memory simulate output)."""
    import numpy as np
    from ns_tpu.cli.run_solver import main as run_main

    out = tmp_path / "ref.npz"
    run_main(["chorin_fd", "--nx", "17", "--nt", "6", "--nit", "50",
              "--pressure-mode", "dst", "--out", str(out)])
    ref = np.load(out)
    run_main(["chorin_fd", "--nx", "17", "--nt", "6", "--nit", "50",
              "--pressure-mode", "dst",
              "--stream-dir", str(tmp_path / "stream")])
    for k in ("u", "v", "p"):
        a = np.load(tmp_path / "stream" / f"{k}.npy")
        np.testing.assert_allclose(a, ref[k], atol=1e-6)


@pytest.mark.slow
def test_run_solver_cli_progress_matches_plain(tmp_path):
    """--progress (chunked tqdm rollout) produces the same fields as the
    fused one-scan rollout, for a cavity family and a periodic one."""
    import numpy as np
    from ns_tpu.cli.run_solver import main as run_main

    ref = tmp_path / "plain.npz"
    got = tmp_path / "prog.npz"
    run_main(["chorin_fd", "--nx", "17", "--nt", "6", "--nit", "50",
              "--pressure-mode", "dst", "--out", str(ref)])
    run_main(["chorin_fd", "--nx", "17", "--nt", "6", "--nit", "50",
              "--pressure-mode", "dst", "--progress", "--chunk", "4",
              "--out", str(got)])
    a, b = np.load(ref), np.load(got)
    for k in ("u", "v", "p"):
        np.testing.assert_allclose(b[k], a[k], atol=1e-12)

    refp = tmp_path / "tg.npz"
    gotp = tmp_path / "tgp.npz"
    run_main(["taylor_green", "--nx", "16", "--nt", "5",
              "--transform", "fft", "--out", str(refp)])
    run_main(["taylor_green", "--nx", "16", "--nt", "5",
              "--transform", "fft", "--progress", "--chunk", "2",
              "--out", str(gotp)])
    a, b = np.load(refp), np.load(gotp)
    for k in ("u", "v", "p"):
        np.testing.assert_allclose(b[k], a[k], atol=1e-6)


def test_transform_auto_resolves_by_crossover():
    """transform='auto' picks the measured-fastest engine: compact
    matmul-DFT under the ~8k^2 FFT crossover, FFT beyond (RESULTS.md)."""
    from ns_tpu.solvers import spectral_periodic as sp

    small = sp.SpectralPeriodicConfig(nx=256, ny=256, transform="auto")
    assert small.transform == "matmul" and small.compact_spectrum

    big = sp.SpectralPeriodicConfig(nx=8192, ny=8192, transform="auto")
    assert big.transform == "fft" and not big.compact_spectrum

    # no dealiasing -> no compact truncated layout -> FFT
    nod = sp.SpectralPeriodicConfig(nx=256, ny=256, transform="auto",
                                    dealias=False)
    assert nod.transform == "fft"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="transform"):
        sp.SpectralPeriodicConfig(transform="typo")


def test_jsonl_logger_serializes_arrays(tmp_path):
    """Array-valued metrics serialize via tolist instead of raising
    'only size-1 arrays can be converted' from inside the logging call."""
    import json

    import numpy as np

    from ns_tpu.utils.jsonl import JSONLLogger

    path = str(tmp_path / "m.jsonl")
    with JSONLLogger(path) as log:
        log.log({"vec": np.arange(3.0), "scalar": np.float32(2.5)}, it=1)
    rec = json.loads(open(path).read().splitlines()[-1])
    assert rec["vec"] == [0.0, 1.0, 2.0] and rec["scalar"] == 2.5


def test_chunked_simulate_rejects_bad_chunk():
    import jax.numpy as jnp
    import pytest

    from ns_tpu.utils.progress import chunked_simulate

    with pytest.raises(ValueError, match="chunk"):
        chunked_simulate(lambda s: s, jnp.zeros(2), 4,
                         lambda s: {"x": s}, chunk=0)


def test_run_solver_cli_3d(tmp_path):
    """CLI: the 3D presets write u/v/w/p npz; strided + forced runs and
    mis-scoped flags validate before compute."""
    import numpy as np
    import pytest
    from ns_tpu.cli.run_solver import main as run_main

    out = tmp_path / "tg3.npz"
    run_main(["taylor_green_3d", "--nx", "8", "--nt", "3",
              "--transform", "matmul", "--precision", "highest",
              "--out", str(out)])
    d = np.load(out)
    for k in ("u", "v", "w", "p"):
        assert d[k].shape == (3, 8, 8, 8) and np.isfinite(d[k]).all(), k

    out2 = tmp_path / "dt3.npz"
    run_main(["decaying_turbulence_3d", "--nx", "8", "--nt", "2",
              "--frame-stride", "2", "--spinup", "1",
              "--forcing", "kolmogorov", "--forcing-k", "2",
              "--out", str(out2)])
    d2 = np.load(out2)
    assert d2["u"].shape == (2, 8, 8, 8) and np.isfinite(d2["u"]).all()

    for bad in (["taylor_green_3d", "--compact"],
                ["taylor_green_3d", "--forcing", "fno"],
                ["taylor_green_3d", "--guard"],
                ["decaying_turbulence_3d", "--n-traj", "2"]):
        with pytest.raises(SystemExit):
            run_main(bad + ["--nx", "8", "--nt", "2"])
