"""Serving layer tests: checkpoint -> engine round trips for every model
family, chunked-rollout equivalence, batching/bucketing correctness,
ensemble member serving, and the HTTP server end-to-end on a loopback
socket. The reference has no serving story at all (its models are only
exercised by the training scripts' eval tails, ref spectral_ode.py:208-224)
— this layer is new production surface, so the tests define its contract.
"""

import http.client
import io
import json
import os
import threading

import numpy as np
import pytest

from ns_tpu.serve.engine import InferenceEngine
from ns_tpu.train.trainer import TrainConfig, Trainer


def _toy_npz(tmp_path, nt=8, nx=8, ny=8, name="sdata.npz"):
    rng = np.random.default_rng(3)
    path = tmp_path / name
    np.savez(path, u=rng.normal(size=(nt, nx, ny)),
             v=rng.normal(size=(nt, nx, ny)),
             p=rng.normal(size=(nt, nx, ny)))
    return str(path), nt, nx, ny


def _train(tmp_path, model, name, **kw):
    npz, nt, nx, ny = _toy_npz(tmp_path, name=f"{name}.npz")
    cfg = TrainConfig(model=model, npz_path=npz,
                      out_dir=str(tmp_path / name), n_iters=4,
                      n_coeffs=2, n_frames=nt, ckpt_every=4,
                      fno_modes=3, fno_width=6, **kw)
    tr = Trainer(cfg)
    tr.train(progress=False)
    return tr, os.path.join(cfg.out_dir, "checkpoint.npz"), nt, nx, ny


@pytest.mark.slow
def test_engine_fno_roundtrip_and_chunk_equivalence(tmp_path):
    """from_checkpoint rebuilds the trained model exactly: the engine's
    chunked rollout equals the Trainer's in-memory extrapolation, for any
    chunk size (chunking must not change values)."""
    tr, ckpt, nt, nx, ny = _train(tmp_path, "fno", "fno")
    want = tr.extrapolate()                       # (nt, 3, nx, ny)
    frame0 = want[0]
    for chunk in (2, 64):
        eng = InferenceEngine.from_checkpoint(ckpt, chunk=chunk)
        got = eng.predict(frame0, nt - 1)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.slow
def test_engine_fno_w_roundtrip(tmp_path):
    """Engine equals Trainer.extrapolate when both start from the same
    RAW data frame (both derive w with the same adapter; feeding a
    reconstructed frame instead would band-limit the initial w)."""
    tr, ckpt, nt, nx, ny = _train(tmp_path, "fno_w", "fnow")
    want = tr.extrapolate()
    obs = np.load(tr.cfg.npz_path)
    frame0 = np.stack([obs["u"][0], obs["v"][0], obs["p"][0]]).astype(
        np.float32)
    eng = InferenceEngine.from_checkpoint(ckpt, chunk=3)
    got = eng.predict(frame0, nt - 1)
    assert got.shape == (nt, 3, nx, ny)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("model", ["basis_ode", "basis_gru", "rnn"])
def test_engine_other_families(tmp_path, model):
    tr, ckpt, nt, nx, ny = _train(tmp_path, model, model)
    eng = InferenceEngine.from_checkpoint(ckpt)
    obs = np.load(tr.cfg.npz_path)
    frame0 = np.stack([obs["u"][0], obs["v"][0], obs["p"][0]]).astype(
        np.float32)
    out = eng.predict(frame0, 5)
    assert out.shape == (6, 3, nx, ny)
    assert np.isfinite(out).all()
    if model == "rnn":  # frame 0 is the echoed input
        np.testing.assert_array_equal(out[0], frame0)


@pytest.mark.slow
def test_engine_batched_matches_single(tmp_path):
    """A batch row must equal the same request served alone (bucket
    padding is invisible), and a 3-row batch exercises pad-to-4."""
    tr, ckpt, nt, nx, ny = _train(tmp_path, "fno", "fnob")
    eng = InferenceEngine.from_checkpoint(ckpt, chunk=4)
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(3, 3, nx, ny)).astype(np.float32)
    batch = eng.predict(frames, 4)
    assert batch.shape == (3, 5, 3, nx, ny)
    for i in range(3):
        single = eng.predict(frames[i], 4)
        np.testing.assert_allclose(batch[i], single, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_engine_ensemble_members(tmp_path):
    """EnsembleTrainer checkpoints serve member-stacked rollouts; members
    differ (distinct seeds) and the member axis reduces to a mean."""
    from ns_tpu.train.ensemble import EnsembleTrainer

    npz, nt, nx, ny = _toy_npz(tmp_path, name="ens.npz")
    cfg = TrainConfig(model="fno_w", npz_path=npz,
                      out_dir=str(tmp_path / "ens"), n_iters=4,
                      n_frames=nt, ckpt_every=4, fno_modes=3, fno_width=6)
    etr = EnsembleTrainer(cfg, n_models=2)
    etr.train(progress=False)
    eng = InferenceEngine.from_checkpoint(str(tmp_path / "ens"), chunk=3)
    assert eng.n_models == 2
    obs = np.load(npz)
    frame0 = np.stack([obs["u"][0], obs["v"][0], obs["p"][0]]).astype(
        np.float32)
    out = eng.predict(frame0, 4)
    assert out.shape == (2, 5, 3, nx, ny)
    assert np.isfinite(out).all()
    assert not np.allclose(out[0][1:], out[1][1:])  # member diversity
    # both members echo the identical input state (the w-space
    # reconstruction of frame0 — band-limited, so not frame0 bitwise)
    np.testing.assert_array_equal(out[0][0], out[1][0])


@pytest.mark.slow
def test_engine_validation_errors(tmp_path):
    tr, ckpt, nt, nx, ny = _train(tmp_path, "fno", "fnov")
    eng = InferenceEngine.from_checkpoint(ckpt)
    with pytest.raises(ValueError, match="frame0"):
        eng.predict(np.zeros((3, nx + 1, ny), np.float32), 1)
    with pytest.raises(ValueError, match="n_steps"):
        eng.predict(np.zeros((3, nx, ny), np.float32), -1)
    # wrong model config for this checkpoint -> named leaf error
    meta_path = ckpt + ".meta.json"
    with open(meta_path) as f:
        meta = json.load(f)
    meta["config"]["fno_width"] = 12
    alt = str(tmp_path / "wrongcfg")
    os.makedirs(alt)
    import shutil
    shutil.copyfile(ckpt, os.path.join(alt, "checkpoint.npz"))
    with open(os.path.join(alt, "checkpoint.npz.meta.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="shape|missing"):
        InferenceEngine.from_checkpoint(alt)


@pytest.mark.slow
def test_engine_stats(tmp_path):
    tr, ckpt, nt, nx, ny = _train(tmp_path, "fno", "fnos")
    eng = InferenceEngine.from_checkpoint(ckpt, chunk=4)
    eng.warmup(2)
    eng.predict(np.zeros((3, nx, ny), np.float32), 6)
    s = eng.stats()
    assert s["requests"] == 2
    assert s["steps_served"] == 8
    assert s["latency_s"]["p50"] is not None
    assert s["compiled_programs"] >= 1


# ---------------------------------------------------------------------------
# HTTP server end-to-end (loopback)
# ---------------------------------------------------------------------------


@pytest.fixture()
def running_server(tmp_path):
    from ns_tpu.serve.server import make_server

    tr, ckpt, nt, nx, ny = _train(tmp_path, "fno", "fnosrv")
    eng = InferenceEngine.from_checkpoint(ckpt, chunk=4)
    httpd = make_server(eng, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield httpd.server_address[1], eng, nx, ny
    finally:
        httpd.shutdown()
        httpd.server_close()


def _post_npy(port, path, arr):
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path, body=buf.getvalue(),
                 headers={"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp.status, body


def test_server_end_to_end(running_server):
    port, eng, nx, ny = running_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/health")
    resp = json.loads(conn.getresponse().read())
    assert resp["ok"] and resp["grid"] == [nx, ny]
    conn.close()

    frame0 = np.zeros((3, nx, ny), np.float32)
    status, body = _post_npy(port, "/rollout?steps=5", frame0)
    assert status == 200
    out = np.load(io.BytesIO(body), allow_pickle=False)
    assert out.shape == (6, 3, nx, ny)
    # the HTTP path returns exactly what the engine returns
    np.testing.assert_array_equal(out, eng.predict(frame0, 5))

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/stats")
    stats = json.loads(conn.getresponse().read())
    assert stats["requests"] >= 1
    conn.close()


def test_server_single_model_reduce_contract(running_server):
    """A single-model endpoint honors the ensemble reduce contract:
    'members' gains a leading axis of 1, 'spread' is exactly zero —
    never the raw fields misread as uncertainty."""
    port, eng, nx, ny = running_server
    frame0 = np.zeros((3, nx, ny), np.float32)
    raw = eng.predict(frame0, 3)

    status, body = _post_npy(port, "/rollout?steps=3&reduce=members",
                             frame0)
    assert status == 200
    out = np.load(io.BytesIO(body), allow_pickle=False)
    assert out.shape == (1,) + raw.shape
    np.testing.assert_array_equal(out[0], raw)

    status, body = _post_npy(port, "/rollout?steps=3&reduce=spread",
                             frame0)
    assert status == 200
    out = np.load(io.BytesIO(body), allow_pickle=False)
    assert out.shape == raw.shape
    np.testing.assert_array_equal(out, np.zeros_like(raw))


def test_server_client_errors(running_server):
    port, eng, nx, ny = running_server
    # wrong shape -> 400 with the engine's message
    status, body = _post_npy(port, "/rollout?steps=2",
                             np.zeros((3, nx + 1, ny), np.float32))
    assert status == 400 and b"frame0" in body
    # bad reduce -> 400
    status, body = _post_npy(port, "/rollout?steps=2&reduce=median",
                             np.zeros((3, nx, ny), np.float32))
    assert status == 400
    # unknown path -> 404
    status, body = _post_npy(port, "/nope", np.zeros(1, np.float32))
    assert status == 404


# ---------------------------------------------------------------------------
# Solver serving: the oracle behind the same contract
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_solver_engine_matches_simulate():
    """Served frames equal the solver's own rollout: frames[i] is the
    state after i solver steps (simulate()'s frame k is the state after
    k+1 steps), and chunking must not change values."""
    import jax.numpy as jnp
    from ns_tpu.serve.solver import SolverEngine
    from ns_tpu.solvers import spectral_periodic as sp

    import jax as _jax
    from ns_tpu.models.vorticity import dealias_field

    nx = 32
    cfg = sp.SpectralPeriodicConfig(nt=6, nx=nx, ny=nx, dt=1e-3, nu=1e-3,
                                    dtype="float32")
    # the (u,v) -> w round trip is exact only on the dealiased band the
    # solver itself evolves; start from a band-limited state (what any
    # solver- or surrogate-produced frame is)
    w0 = np.asarray(_jax.jit(dealias_field)(
        sp.decaying_turbulence_vorticity(cfg, seed=0)))
    u, v, p = (np.asarray(a) for a in sp.NavierStokesSystem(
        w0, nt=6, nx=nx, ny=nx, dt=1e-3, nu=1e-3).simulate())

    # initial physical state reconstructed from w0 (what a client holds)
    state0 = sp.init_from_vorticity(cfg, w0)
    uu, vv, _w = sp.fields_from_hat(cfg, state0[0])
    pp = sp.pressure_from_hat(cfg, state0[0])
    frame0 = np.stack([np.asarray(uu), np.asarray(vv), np.asarray(pp)])

    for chunk in (2, 64):
        eng = SolverEngine(nx, nx, dt=1e-3, nu=1e-3, chunk=chunk)
        out = eng.predict(frame0, 6)
        assert out.shape == (7, 3, nx, nx)
        # frames[k+1] == simulate()'s frame k (state after k+1 steps)
        np.testing.assert_allclose(out[1:, 0], u, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(out[1:, 1], v, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(out[1:, 2], p, rtol=2e-4, atol=1e-4)
        # frame 0 echoes the input state
        np.testing.assert_allclose(out[0], frame0, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_solver_engine_forced_matches_simulate():
    """The oracle endpoint serves FORCED dynamics when asked: frames
    equal the forced solver's own rollout (and differ from unforced)."""
    import jax as _jax
    from ns_tpu.models.vorticity import dealias_field
    from ns_tpu.serve.solver import SolverEngine
    from ns_tpu.solvers import spectral_periodic as sp

    nx = 32
    fk = dict(forcing="kolmogorov", forcing_k=2, forcing_amp=0.2)
    cfg = sp.SpectralPeriodicConfig(nt=5, nx=nx, ny=nx, dt=1e-3, nu=1e-3,
                                    dtype="float32", **fk)
    w0 = np.asarray(_jax.jit(dealias_field)(
        sp.decaying_turbulence_vorticity(cfg, seed=0)))
    u, v, p = (np.asarray(a) for a in sp.NavierStokesSystem(
        w0, nt=5, nx=nx, ny=nx, dt=1e-3, nu=1e-3, **fk).simulate())

    state0 = sp.init_from_vorticity(cfg, w0)
    uu, vv, _w = sp.fields_from_hat(cfg, state0[0])
    pp = sp.pressure_from_hat(cfg, state0[0])
    frame0 = np.stack([np.asarray(uu), np.asarray(vv), np.asarray(pp)])

    eng = SolverEngine(nx, nx, dt=1e-3, nu=1e-3, chunk=4, **fk)
    out = eng.predict(frame0, 5)
    np.testing.assert_allclose(out[1:, 0], u, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(out[1:, 1], v, rtol=2e-4, atol=1e-5)

    unforced = SolverEngine(nx, nx, dt=1e-3, nu=1e-3, chunk=4)
    out0 = unforced.predict(frame0, 5)
    assert np.abs(out[1:] - out0[1:]).max() > 1e-6


def test_solver_engine_stride():
    """stride=k serves every k-th solver state (surrogate cadence)."""
    from ns_tpu.serve.solver import SolverEngine
    from ns_tpu.solvers import spectral_periodic as sp

    import jax as _jax
    from ns_tpu.models.vorticity import dealias_field

    nx = 32
    cfg = sp.SpectralPeriodicConfig(nt=8, nx=nx, ny=nx, dt=1e-3, nu=1e-3,
                                    dtype="float32")
    w0 = np.asarray(_jax.jit(dealias_field)(
        sp.decaying_turbulence_vorticity(cfg, seed=1)))
    state0 = sp.init_from_vorticity(cfg, w0)
    uu, vv, _w = sp.fields_from_hat(cfg, state0[0])
    pp = sp.pressure_from_hat(cfg, state0[0])
    frame0 = np.stack([np.asarray(uu), np.asarray(vv), np.asarray(pp)])

    dense = SolverEngine(nx, nx, stride=1).predict(frame0, 8)
    strided = SolverEngine(nx, nx, stride=4).predict(frame0, 2)
    np.testing.assert_allclose(strided, dense[::4], rtol=2e-4, atol=1e-5)


def test_solver_engine_validation():
    from ns_tpu.serve.solver import SolverEngine
    eng = SolverEngine(16, 16)
    with pytest.raises(ValueError, match="frame0"):
        eng.predict(np.zeros((2, 3, 16, 16), np.float32), 1)
    with pytest.raises(ValueError, match="stride"):
        SolverEngine(16, 16, stride=0)


def test_server_with_solver_engine(tmp_path):
    """The HTTP layer is engine-agnostic: the solver oracle serves the
    same wire protocol."""
    from ns_tpu.serve.server import make_server
    from ns_tpu.serve.solver import SolverEngine

    eng = SolverEngine(16, 16, chunk=4)
    httpd = make_server(eng, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/health")
        h = json.loads(conn.getresponse().read())
        assert h["model"] == "solver:spectral_periodic"
        conn.close()
        status, body = _post_npy(port, "/rollout?steps=3",
                                 np.zeros((3, 16, 16), np.float32))
        assert status == 200
        out = np.load(io.BytesIO(body), allow_pickle=False)
        assert out.shape == (4, 3, 16, 16)
        assert np.isfinite(out).all()
    finally:
        httpd.shutdown()
        httpd.server_close()


# ---------------------------------------------------------------------------
# Typed client (serve/client.py)
# ---------------------------------------------------------------------------


def test_client_roundtrip(running_server):
    """ServeClient speaks the same wire protocol as the raw example."""
    from ns_tpu.serve import ServeClient, ServeError

    port, eng, nx, ny = running_server
    c = ServeClient("127.0.0.1", port)
    h = c.health()
    assert h["ok"] and h["grid"] == [nx, ny]

    frame0 = np.zeros((3, nx, ny), np.float32)
    out = c.rollout(frame0, 5)
    assert out.shape == (6, 3, nx, ny)
    np.testing.assert_array_equal(out, eng.predict(frame0, 5))

    s = c.stats()
    assert s["requests"] >= 1

    # server-side errors surface as ServeError with status + message
    with pytest.raises(ServeError, match="frame0") as ei:
        c.rollout(np.zeros((3, nx + 1, ny), np.float32), 2)
    assert ei.value.status == 400
    with pytest.raises(ServeError, match="reduce"):
        c.rollout(frame0, 2, reduce="median")


@pytest.mark.slow
def test_solver_engine_3d_matches_simulate():
    """3D oracle endpoint: served frames equal NavierStokesSystem3D's own
    rollout, chunking-invariant; frame 0 echoes the (projected) input."""
    import jax as _jax
    from ns_tpu.serve.solver import SolverEngine3D
    from ns_tpu.solvers import spectral3d as s3

    n = 12
    cfg = s3.Spectral3DConfig(nt=5, nx=n, ny=n, nz=n, dt=1e-3, nu=1e-3,
                              dtype="float32")
    u0 = np.asarray(s3.random_solenoidal_velocity(cfg, seed=0, k_peak=2.0))
    sys3 = s3.NavierStokesSystem3D(u0, nt=5, nx=n, ny=n, nz=n, dt=1e-3,
                                   nu=1e-3, dtype="float32")
    u, v, w, p = (np.asarray(a) for a in sys3.simulate())

    carry0 = s3.init_from_velocity(cfg, u0)
    vel0 = np.asarray(_jax.jit(
        lambda z: s3.fields_from_hat(cfg, z))(carry0[0]))
    p0 = np.asarray(_jax.jit(
        lambda z: s3.pressure_from_hat(cfg, z))(carry0[0]))
    frame0 = np.concatenate([vel0, p0[None]])

    for chunk in (2, 16):
        eng = SolverEngine3D(n, n, n, dt=1e-3, nu=1e-3, chunk=chunk,
                             transform="fft")  # match sys3's engine
        out = eng.predict(frame0, 5)
        assert out.shape == (6, 4, n, n, n)
        np.testing.assert_allclose(out[1:, 0], u, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(out[1:, 1], v, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(out[1:, 2], w, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(out[1:, 3], p, rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(out[0], frame0, rtol=1e-5, atol=1e-6)
    assert eng.stats()["model"] == "solver:spectral3d"


def test_solver_engine_3d_validation():
    from ns_tpu.serve.solver import SolverEngine3D
    eng = SolverEngine3D(8, 8, 8)
    with pytest.raises(ValueError):
        eng.predict(np.zeros((3, 8, 8, 8), np.float32), 1)
    with pytest.raises(ValueError):
        eng.predict(np.zeros((4, 8, 8, 8), np.float32), -1)
    with pytest.raises(ValueError):
        SolverEngine3D(8, 8, 8, stride=0)


def test_serve_cli_3d_validation():
    from ns_tpu.cli.serve import main as serve_main
    for bad in (["--ckpt", "x", "--dims", "3"],
                ["--solver", "--dims", "3", "--forcing", "fno"]):
        with pytest.raises(SystemExit):
            serve_main(bad)


# ---------------------------------------------------------------------------
# Request coalescing (serve/batching.py — VERDICT r3 weak #5)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_coalescing_matches_serialized_and_batches(tmp_path):
    """N concurrent clients through the coalescing server get byte-
    identical replies to the serialized engine path, and the dispatcher
    actually coalesces (fewer device batches than requests)."""
    from concurrent.futures import ThreadPoolExecutor

    from ns_tpu.serve.server import make_server

    tr, ckpt, nt, nx, ny = _train(tmp_path, "fno", "fnocoal")
    eng = InferenceEngine.from_checkpoint(ckpt, chunk=4)
    httpd = make_server(eng, host="127.0.0.1", port=0, coalesce=8)
    assert httpd.dispatcher is not None
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    rng = np.random.default_rng(0)
    frames = [rng.standard_normal((3, nx, ny)).astype(np.float32)
              for _ in range(12)]
    want = [eng.predict(f, 5) for f in frames]  # serialized oracle
    try:
        with ThreadPoolExecutor(max_workers=12) as ex:
            got = list(ex.map(
                lambda f: _post_npy(port, "/rollout?steps=5", f), frames))
        for (status, body), w in zip(got, want):
            assert status == 200
            out = np.load(io.BytesIO(body), allow_pickle=False)
            assert out.shape == (6, 3, nx, ny)
            # engine batch programs equal the single path to fp tolerance
            # (same traced math, batched leading axis)
            np.testing.assert_allclose(out, w, rtol=1e-4, atol=1e-5)
        st = httpd.dispatcher.stats()
        assert st["coalesced_requests"] >= 12
        assert st["batches"] < 12  # something actually coalesced
        # client-batched requests keep the serialized path (extra axis)
        status, body = _post_npy(
            port, "/rollout?steps=2", np.stack(frames[:2]))
        assert status == 200
        out = np.load(io.BytesIO(body), allow_pickle=False)
        assert out.shape == (2, 3, 3, nx, ny)
    finally:
        httpd.shutdown()
        httpd.server_close()
    assert not httpd.dispatcher._thread.is_alive()


def test_coalesce_rejected_for_solver(tmp_path):
    from ns_tpu.serve.server import make_server
    from ns_tpu.serve.solver import SolverEngine

    with pytest.raises(ValueError, match="surrogate"):
        make_server(SolverEngine(8, 8), port=0, coalesce=4)


@pytest.mark.slow
def test_coalescing_ensemble_members_first(tmp_path):
    """Ensemble endpoints coalesce too: every concurrent single-state
    request gets the identical (M, steps+1, C, nx, ny) members-first
    reply the serialized path produces (serve/batching.py scope note),
    reduce= still collapses the member axis, and the dispatcher actually
    batches. Client-batched requests keep the serialized path."""
    from concurrent.futures import ThreadPoolExecutor

    from ns_tpu.serve.server import make_server
    from ns_tpu.train.ensemble import EnsembleTrainer

    npz, nt, nx, ny = _toy_npz(tmp_path, name="enscoal.npz")
    cfg = TrainConfig(model="fno", npz_path=npz,
                      out_dir=str(tmp_path / "enscoal"), n_iters=4,
                      n_frames=nt, ckpt_every=4, fno_modes=3, fno_width=6)
    EnsembleTrainer(cfg, n_models=2).train(progress=False)
    eng = InferenceEngine.from_checkpoint(str(tmp_path / "enscoal"),
                                          chunk=4)
    assert eng.n_models == 2
    httpd = make_server(eng, host="127.0.0.1", port=0, coalesce=8)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    rng = np.random.default_rng(1)
    frames = [rng.standard_normal((3, nx, ny)).astype(np.float32)
              for _ in range(8)]
    want = [eng.predict(f, 3) for f in frames]  # serialized oracle
    try:
        with ThreadPoolExecutor(max_workers=8) as ex:
            got = list(ex.map(
                lambda f: _post_npy(
                    port, "/rollout?steps=3&reduce=members", f), frames))
        for (status, body), w in zip(got, want):
            assert status == 200
            out = np.load(io.BytesIO(body), allow_pickle=False)
            assert out.shape == (2, 4, 3, nx, ny)
            np.testing.assert_allclose(out, w, rtol=1e-4, atol=1e-5)
        st = httpd.dispatcher.stats()
        assert st["coalesced_requests"] >= 8
        assert st["batches"] < 8
        # reduce=mean collapses the member axis on a coalesced reply
        status, body = _post_npy(
            port, "/rollout?steps=3&reduce=mean", frames[0])
        assert status == 200
        out = np.load(io.BytesIO(body), allow_pickle=False)
        np.testing.assert_allclose(out, want[0].mean(axis=0),
                                   rtol=1e-4, atol=1e-5)
        # client-batched ensemble requests keep the serialized path
        status, body = _post_npy(
            port, "/rollout?steps=2&reduce=members", np.stack(frames[:2]))
        assert status == 200
        out = np.load(io.BytesIO(body), allow_pickle=False)
        assert out.shape == (2, 2, 3, 3, nx, ny)  # (M, B, t, C, nx, ny)
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_coalescer_propagates_engine_errors(tmp_path):
    """A request whose batch fails gets the engine's error, not a hang."""
    from ns_tpu.serve.batching import CoalescingDispatcher

    tr, ckpt, nt, nx, ny = _train(tmp_path, "fno", "fnoerr")
    eng = InferenceEngine.from_checkpoint(ckpt, chunk=4)
    d = CoalescingDispatcher(eng, max_batch=4)
    try:
        with pytest.raises(ValueError):
            d.submit(np.zeros((3, nx, ny), np.float32), -1)
        # still serviceable afterwards
        out = d.submit(np.zeros((3, nx, ny), np.float32), 2)
        assert out.shape == (3, 3, nx, ny)
    finally:
        d.close()
