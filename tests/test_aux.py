"""Aux subsystem tests: non-finite update guard, metrics logger,
config flag parity, nan debugging toggles."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.config import TrainConfig, train_config_from_args
from facegen.models import gan
from facegen.train.step import init_state, make_train_step


def test_guard_nonfinite_skips_poisoned_update():
    cfg = TrainConfig(
        batch_size=8, scale=16, grayscale=True, noise_dim=16, n_epoch=16,
        compute_dtype="float32", reference_init=False, guard_nonfinite=True,
    ).validate()
    g, d, bundle = gan.init_gan(jax.random.key(0), 16, 1, 16, reference_init=False)
    # poison D params so its loss/grads go NaN
    bundle["params_d"] = jax.tree.map(
        lambda x: jnp.full_like(x, jnp.nan), bundle["params_d"]
    )
    state = init_state(cfg, bundle)
    pool = jax.random.randint(jax.random.key(1), (32, 16, 16, 1), 0, 256, jnp.uint8)
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, m = step(state, jax.random.key(2), pool)
    # D update skipped (grads nan) — params unchanged (still nan, but not updated)
    assert int(new_state.not_trained_d) == 1
    # G grads flow through a NaN D -> also non-finite -> G update skipped
    for a, b in zip(jax.tree.leaves(new_state.params_g), jax.tree.leaves(state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics_logger_roundtrip(tmp_path):
    from facegen.utils.profiling import MetricsLogger

    ml = MetricsLogger(str(tmp_path))
    ml.log({"epoch": 1, "loss": 0.5})
    ml.log({"epoch": 2, "loss": 0.25})
    records = ml.read_all()
    assert len(records) == 2
    assert records[1]["epoch"] == 2
    assert "time" in records[0]


def _write_fake_trace(logdir, events):
    import gzip

    d = os.path.join(logdir, "plugins", "profile", "2026_01_01_00_00_00")
    os.makedirs(d, exist_ok=True)
    with gzip.open(os.path.join(d, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_aggregate_trace_per_op_table(tmp_path):
    """aggregate_trace: uses the device 'XLA Ops' track, excludes the
    `while` scan wrapper (it encloses its body ops — counting both would
    double-count), and derives achieved TFLOP/s / GB/s from XLA's own
    per-op accounting."""
    from facegen.utils import profiling

    meta = [
        {"ph": "M", "pid": 3, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name", "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name", "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name", "args": {"name": "python"}},
    ]
    evs = meta + [
        # module track: must not enter the op table
        {"ph": "X", "pid": 3, "tid": 2, "ts": 0, "dur": 100, "name": "jit_epoch"},
        # scan wrapper enclosing the leaves: excluded by category
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 100, "name": "while.1",
         "args": {"hlo_category": "while"}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 1, "dur": 60, "name": "fusion.7",
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "6000000", "bytes_accessed": "1200"}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 61, "dur": 40, "name": "copy.2",
         "args": {"hlo_category": "data formatting"}},
        # host track event: ignored
        {"ph": "X", "pid": 9, "tid": 1, "ts": 0, "dur": 999, "name": "python_host"},
    ]
    _write_fake_trace(str(tmp_path), evs)
    s = profiling.aggregate_trace(str(tmp_path))
    assert s["device"] == "/device:TPU:0"
    assert s["total_us"] == pytest.approx(100.0)
    assert s["module_total_us"] == pytest.approx(100.0)
    names = [r["name"] for r in s["ops"]]
    assert names == ["fusion.7", "copy.2"]
    conv = s["ops"][0]
    assert conv["share"] == pytest.approx(0.6)
    # 6e6 flops / 60us = 0.1 TFLOP/s; 1200 B / 60us = 0.02 GB/s
    assert conv["tflops"] == pytest.approx(0.1)
    assert conv["gbps"] == pytest.approx(0.02)
    cats = {r["category"]: r["share"] for r in s["categories"]}
    assert cats["convolution fusion"] == pytest.approx(0.6)
    table = profiling.format_op_table(s)
    assert "fusion.7" in table and "while.1" not in table


def test_trace_capture_roundtrip(tmp_path):
    """End-to-end: capture a real trace of a jitted op and aggregate it
    (the `bench.py --profile` path)."""
    from facegen.utils import profiling

    with profiling.trace(str(tmp_path)):
        x = jnp.ones((128, 128))
        y = jax.jit(lambda a: a @ a)(x)
        jax.block_until_ready(y)
    s = profiling.aggregate_trace(str(tmp_path))
    assert s["ops"], "no ops captured"
    assert s["total_us"] > 0


def test_cli_flag_parity():
    cfg = train_config_from_args([
        "--batchSize", "16", "--scale", "16", "--grayscale",
        "--D_L2", "1e-5", "--D_iterations", "2", "--D_maxAcc", "0.9",
        "--G_clamp", "3", "--D_optmethod", "adagrad", "--seed", "5",
        "--noiseDim", "64", "--N_epoch", "500", "--saveFreq", "10",
        "--syntheticData",
    ])
    assert cfg.batch_size == 16 and cfg.scale == 16 and cfg.grayscale
    assert cfg.d_l2 == 1e-5 and cfg.d_iterations == 2 and cfg.d_max_acc == 0.9
    assert cfg.g_clamp == 3 and cfg.d_optmethod == "adagrad"
    assert cfg.seed == 5 and cfg.noise_dim == 64 and cfg.n_epoch == 500
    assert cfg.save_freq == 10 and cfg.synthetic_data


def test_cli_rejects_odd_batch():
    with pytest.raises(ValueError):
        train_config_from_args(["--batchSize", "7"])


def test_dashboard_server(tmp_path):
    import urllib.request

    from facegen.utils.grids import save_png
    from facegen.utils.profiling import MetricsLogger
    from facegen.utils.viewer import serve

    base = str(tmp_path)
    MetricsLogger(base).log({"epoch": 1, "loss": 0.4})
    save_png(os.path.join(base, "viz", "samples_fixed.png"),
             np.zeros((8, 8, 1), np.float32))
    httpd = serve(base, port=0, background=True)
    port = httpd.server_address[1]
    try:
        page = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read().decode()
        assert "samples_fixed.png" in page and "facegen" in page
        img = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/img/samples_fixed.png").read()
        assert img[:4] == b"\x89PNG"
        metrics = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics").read())
        assert metrics[0]["epoch"] == 1
    finally:
        httpd.shutdown()


def test_accs_interval_formula():
    # train.lua:207: max(20, min(1000/batchSize, 250))
    assert TrainConfig(batch_size=32).accs_interval == 31
    assert TrainConfig(batch_size=4).accs_interval == 250
    assert TrainConfig(batch_size=100).accs_interval == 20


def test_prefetcher_tolerates_unconsumed_schedule(tmp_path):
    """A failed epoch between schedule() and get() must not poison the
    next schedule() (VERDICT r1 weak #7)."""
    import numpy as np

    from facegen.data.pipeline import DataSource, Prefetcher

    store = np.random.RandomState(0).randint(
        0, 256, (32, 64, 64, 3)).astype(np.uint8)
    src = DataSource(16, 1, store=store, threads=2, hbm_store=False)
    pf = Prefetcher(src, 8)
    pf.schedule(jax.random.key(0))
    # epoch "fails" here: get() never called; next schedule must drain
    pf.schedule(jax.random.key(1))
    pool = pf.get(jax.random.key(2))
    assert pool.shape == (8, 16, 16, 1)


def test_viz_window_prefix(tmp_path):
    from facegen.models import gan
    from facegen.utils.infer import GanInference
    from facegen.utils.viz import visualize_progress

    g, d, bundle = gan.init_gan(jax.random.key(0), 16, 1, 8,
                                reference_init=False)
    inf = GanInference(g, d, 8, "float32")
    pool = jax.random.randint(jax.random.key(1), (4, 16, 16, 1), 0, 256,
                              jnp.uint8)
    noise = inf.noise(jax.random.key(2), 4)
    visualize_progress(inf, bundle, noise, pool, str(tmp_path),
                       jax.random.key(3), window=7)
    assert os.path.exists(os.path.join(str(tmp_path), "w7_samples_fixed.png"))
    assert not os.path.exists(os.path.join(str(tmp_path), "samples_fixed.png"))
    # default window keeps canonical names
    visualize_progress(inf, bundle, noise, pool, str(tmp_path),
                       jax.random.key(3), window=3)
    assert os.path.exists(os.path.join(str(tmp_path), "samples_fixed.png"))
