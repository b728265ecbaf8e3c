"""Throughput measurement utilities (BASELINE.json metric machinery).

Used by the repo-root bench.py (driver entry) and `python -m tapnet_tpu.cli
bench`. The baseline measurement reproduces the reference's own mechanism —
the per-instance Python step loop — live on this host (BASELINE.md: the
empty reference mount has no published numbers).

Every `measure_*_stats` function runs `runs` independent timed windows over
one compiled executable and reports {value=median, min, max, runs, iters,
batch} so run-to-run variance (±15% observed across driver rounds) is
explicit in each committed number (VERDICT r2 item 5).
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def _stats(vals, batch, iters):
    return {"value": round(statistics.median(vals), 1),
            "min": round(min(vals), 1), "max": round(max(vals), 1),
            "runs": len(vals), "iters": iters, "batch": batch}


def _try_device_ms(fn, name, iters=3):
    """Profiler device ms/call of fn, or None when no device plane exists
    (CPU backend) or tracing fails — benchmarks must never die to profiling.

    On a TPU backend a failure is loudly warned (ADVICE r4): a silently
    vanished device anchor is indistinguishable from an intentional CPU run
    in the committed JSON, and device time is the number of record."""
    import sys

    from tapnet_tpu.utils.profiling import device_time_ms

    if jax.default_backend() != "tpu":
        return None
    try:
        return device_time_ms(fn, name, iters=iters, warmup=1)
    except Exception as e:  # noqa: BLE001 — any profiling failure is non-fatal
        print(f"WARNING: device-time attribution for {name!r} failed on a "
              f"TPU backend ({type(e).__name__}: {e}); device anchors will "
              "be missing from this row", file=sys.stderr)
        return None


def measure_oracle_steps_per_s(cfg, n_instances: int = 8) -> float:
    """Reference mechanism: per-instance Python loop (steps/s, one process).

    All threefry draws are precomputed OUTSIDE the timed region (bit-parity
    preserved — rollout_rbits is the exact inline stream): an eager
    jax.random.bits per step costs ~0.85 ms of dispatch latency, which is
    JAX overhead, not env math, and inflated the reported speedup ~100x
    (VERDICT r3 weak #2). The timed loop is now pure numpy env stepping —
    the honest "reference mechanism" cost.
    """
    from tapnet_tpu.oracle import generate_instance, oracle_rollout
    from tapnet_tpu.oracle.rollout import rollout_rbits

    with jax.default_device(jax.devices("cpu")[0]):
        key = jax.random.key(0)
        keys = jax.random.split(key, n_instances)
        instances = [generate_instance(k, cfg) for k in keys]
        all_rbits = [rollout_rbits(k, cfg) for k in keys]
        t0 = time.perf_counter()
        steps = 0
        for inst, rb in zip(instances, all_rbits):
            _, actions, _ = oracle_rollout(inst, cfg, policy="random",
                                           rbits=rb)
            steps += int((np.asarray(actions) >= 0).sum())
        return steps / (time.perf_counter() - t0)


def measure_native_steps_per_s(cfg, n_instances: int = 4096,
                               n_threads: int = 1) -> float:
    """Reference mechanism on the optimized host path: the C++ env tier
    (native/tapenv.cc, bit-equal to the oracle), single-threaded by default.
    This anchors vs_baseline against the best possible CPU implementation of
    the per-instance loop, not a Python interpreter (VERDICT r3 weak #2)."""
    from tapnet_tpu import native
    from tapnet_tpu.env import sample_batch

    if not native.is_available():
        return float("nan")
    with jax.default_device(jax.devices("cpu")[0]):
        key = jax.random.key(0)
        instances = jax.tree.map(np.asarray,
                                 sample_batch(key, n_instances, cfg))
        rbits = np.asarray(
            jax.vmap(lambda k: jax.vmap(lambda t: jax.random.bits(
                jax.random.fold_in(k, t), dtype=jnp.uint32))(
                    jnp.arange(cfg.num_blocks, dtype=jnp.int32)))(
                        jax.random.split(key, n_instances)))
    # warm (thread pool spin-up, page faults)
    native.rollout_batch(instances, cfg, policy="random", rbits=rbits,
                         n_threads=n_threads)
    t0 = time.perf_counter()
    _, actions, _ = native.rollout_batch(instances, cfg, policy="random",
                                         rbits=rbits, n_threads=n_threads)
    dt = time.perf_counter() - t0
    return int((actions >= 0).sum()) / dt


def measure_pack_stats(cfg, batch: int = 4096, hidden: int = 128,
                       iters: int = 10, runs: int = 3,
                       policy: str = "greedy") -> dict:
    """Serving surface END-TO-END: instances -> executable PackingPlan via
    infer.pack(), including the host materialization of actions/rewards
    (PackingPlan converts to numpy, so every timed iteration pays the full
    device->host sync — the latency a serving caller actually sees).
    Reported as env-steps/s plus plans (instances)/s; device anchor from
    the underlying jitted rollout (VERDICT r4 item 6)."""
    from tapnet_tpu import infer
    from tapnet_tpu.env import sample_batch
    from tapnet_tpu.models import init_params

    key = jax.random.key(0)
    params = (init_params(key, cfg, hidden)["actor"]
              if policy in ("greedy", "sample", "best") else None)
    instances = sample_batch(key, batch, cfg)

    def run_iter(i):
        plan = infer.pack(instances, cfg, actor_params=params, hidden=hidden,
                          policy=policy, key=jax.random.key(i))
        return plan.rewards          # numpy — already synced to host

    vals = _timed_windows(run_iter, iters, runs, batch * cfg.num_blocks)
    out = _stats(vals, batch, iters)
    out["policy"] = policy
    out["plans_per_s"] = round(out["value"] / cfg.num_blocks, 1)
    name = {"greedy": "policy_rollout_batch", "sample":
            "policy_rollout_batch", "best": "policy_rollout_best_of"}.get(
                policy, "fused_rollout_batch")
    dev = _try_device_ms(lambda: run_iter(0), name)
    if dev:
        out["device_ms_per_batch"] = round(dev, 3)
        out["device_env_steps_per_s"] = round(
            batch * cfg.num_blocks / (dev / 1e3), 1)
    return out


def measure_native_thread_scaling(cfg, n_instances: int = 4096,
                                  threads=(1, 2, 4, 8, 16)) -> dict:
    """env-steps/s of the C++ tier by thread count (serving hosts without
    JAX — VERDICT r4 item 6). NaN-free: returns {} when the toolchain is
    absent."""
    out = {}
    for t in threads:
        v = measure_native_steps_per_s(cfg, n_instances, n_threads=t)
        if v != v:
            return {}
        out[str(t)] = round(v, 1)
    return out


def _timed_windows(run_iter, iters: int, runs: int, steps_per_iter: float):
    """run_iter(i) dispatches one iteration; returns env-steps/s per window.

    The window ends with a VALUE FETCH (device_get of one leaf), not just
    block_until_ready: over the axon tunnel block_until_ready was observed
    returning before the dispatched work completed (a train-step window
    reported 103M env-steps/s wall against a 20.7M device-time bound —
    physically impossible), while fetching bytes cannot lie."""
    vals = []
    for r in range(runs):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = run_iter(r * iters + i)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0])   # force a real completion sync
        vals.append(steps_per_iter * iters / (time.perf_counter() - t0))
    return vals


def _train_run(cfg, batch, hidden, iters, runs, steps_per_call=8,
               device=False):
    """steps_per_call=8: the production dispatch grouping (one lax.scan of
    8 optimizer steps per call, train.reinforce.make_train_step) — host
    dispatch over the TPU tunnel is ~1.3 ms/call vs a ~4 ms device step,
    so per-step dispatch would measure the host, not the chip.

    device=True additionally returns profiler device ms per OPTIMIZER STEP
    (the jit_train_steps outer event / steps_per_call)."""
    from tapnet_tpu.train.reinforce import init_train_state, make_train_step

    ts = init_train_state(jax.random.key(0), cfg, hidden=hidden)
    step = make_train_step(cfg, batch=batch, hidden=hidden,
                           steps_per_call=steps_per_call)
    for _ in range(2):  # compile + steady-state warmup (first executions of
        ts, m = step(ts)  # a program run slow on this backend)
        jax.block_until_ready(m)
    box = [ts]

    def run_iter(_):
        box[0], m = step(box[0])
        # block the window on the full TrainState, not just the metrics:
        # with the custom-VJP replay the metrics value resolved over the
        # tunnel well before the optimizer-state update finished, and
        # metrics-only blocking reported a wall throughput ABOVE the
        # device-time bound (135M vs 20.7M device — impossible)
        return (box[0], m)

    vals = _timed_windows(run_iter, iters, runs,
                          batch * cfg.num_blocks * steps_per_call)
    if not device:
        return vals
    name = "train_steps" if steps_per_call > 1 else "train_step"
    dev = _try_device_ms(lambda: run_iter(0), name)
    return vals, (dev / steps_per_call if dev else None)


def measure_train_steps_per_s(cfg, batch: int = 4096, hidden: int = 128,
                              iters: int = 10) -> float:
    """Learned-policy REINFORCE train step: env-steps/s/chip.

    This is the learner-facing number (BASELINE.json north star: env batches
    "feeding a sharded learner"): one full sample->rollout->replay->grad->
    Adam step per iteration, counted as batch * num_blocks env steps.
    Any batch fits: the replay pass auto-chunks the decode-step axis with
    rematerialization (train.rollout.replay_logp_sum)."""
    return _train_run(cfg, batch, hidden, iters, runs=1)[0]


def measure_train_stats(cfg, batch: int = 4096, hidden: int = 128,
                        iters: int = 10, runs: int = 3,
                        device: bool = True) -> dict:
    """Wall-clock stats + (on TPU) profiler device-time anchor:
    device_ms_per_step and the device-time env-steps/s it implies."""
    vals = _train_run(cfg, batch, hidden, iters, runs, device=device)
    if device:
        vals, dev_ms = vals
        out = _stats(vals, batch, iters)
        if dev_ms:
            out["device_ms_per_step"] = round(dev_ms, 3)
            out["device_env_steps_per_s"] = round(
                batch * cfg.num_blocks / (dev_ms / 1e3), 1)
        return out
    return _stats(vals, batch, iters)


def _env_run(cfg, batch, iters, runs, fused, group=None, device=False):
    """Rollout throughput with `group` rollouts per device dispatch.

    Host dispatch over the TPU tunnel costs ~1 ms/call while a fused-kernel
    rollout is ~50 us of device time, so per-rollout dispatch measures the
    host, not the chip: each timed call runs a lax.scan of `group` rollouts
    (distinct key batches; rewards+actions checksummed into the carry so no
    work is dead). iters is the TOTAL rollout count per window.
    """
    from tapnet_tpu.env import core as E
    from tapnet_tpu.env import sample_batch
    from tapnet_tpu.ops.pallas_env import eligible, fused_rollout_batch

    if fused is None:
        fused = eligible(cfg) and jax.default_backend() == "tpu"
    run = (lambda b, k: fused_rollout_batch(b, k, cfg, policy="random")) \
        if fused else \
        (lambda b, k: E.rollout_batch(b, k, cfg, policy="random"))
    if group is None:
        # the tunnel runtime serializes dispatch with execution (no async
        # overlap) and each end-of-window sync costs a ~20 ms round trip,
        # so work must be grouped per dispatch AND windows must span
        # several dispatches: 128 fused rollouts = 17.2 ms device per call
        # (128 x 0.1343 ms, confirmed by the profiler — PERF.md §1)
        group = 128 if fused else 4
    group = max(1, min(group, iters))

    key = jax.random.key(0)
    batch_inst = sample_batch(key, batch, cfg)
    jax.block_until_ready(batch_inst)

    @jax.jit
    def call(b, keys_g):                      # keys_g [G, B] typed keys
        def body(acc, k):
            _, a, r = run(b, k)
            return (acc[0] + r.sum(), acc[1] + a.sum()), None
        acc, _ = jax.lax.scan(body, (jnp.float32(0), jnp.int32(0)), keys_g)
        return acc

    n_calls = max(1, iters // group)
    key_groups = [
        jnp.stack([jax.random.split(jax.random.key(1 + i * group + g), batch)
                   for g in range(group)])
        for i in range(n_calls * runs)]
    jax.block_until_ready(key_groups)
    jax.block_until_ready(call(batch_inst, key_groups[0]))  # compile

    steps_per_rollout = int(np.asarray(batch_inst.n_total).sum())
    vals = _timed_windows(lambda i: call(batch_inst, key_groups[i]),
                          n_calls, runs, steps_per_rollout * group)
    if not device:
        return vals
    dev = _try_device_ms(lambda: call(batch_inst, key_groups[0]), "call")
    return vals, (dev / group if dev else None), steps_per_rollout


def measure_env_steps_per_s(cfg, batch: int, iters: int = 10,
                            fused: bool = None) -> float:
    """Batched heuristic rollouts on the default backend (TPU when present).

    Uses the fused whole-rollout Pallas kernel when the config is eligible
    (bit-exact vs the general path — parity-tested); pass fused=False to
    measure the general jit/vmap path.
    """
    return _env_run(cfg, batch, iters, 1, fused)[0]


def measure_env_stats(cfg, batch: int, iters: int = 50, runs: int = 3,
                      fused: bool = None, device: bool = True) -> dict:
    """Wall-clock stats + (on TPU) profiler device-time anchor:
    device_ms_per_rollout and the device-time env-steps/s it implies."""
    if device:
        vals, dev_ms, steps = _env_run(cfg, batch, iters, runs, fused,
                                       device=True)
        out = _stats(vals, batch, iters)
        if dev_ms:
            out["device_ms_per_rollout"] = round(dev_ms, 4)
            out["device_env_steps_per_s"] = round(steps / (dev_ms / 1e3), 1)
        return out
    return _stats(_env_run(cfg, batch, iters, runs, fused), batch, iters)


def measure_policy_rollout_stats(cfg, batch: int = 4096, hidden: int = 128,
                                 iters: int = 20, runs: int = 3,
                                 step_kernel: bool = None,
                                 group: int = 4) -> dict:
    """Learned-policy (actor-in-the-loop) rollout throughput, no gradients.

    The train step's inference phase in isolation: actor forward + fused
    select/place kernel per decode step (ops.pallas_policy_step when
    eligible). Counted as batch * num_blocks env steps per rollout.

    `group` rollouts run per device dispatch as one lax.scan (fresh key
    batch each; actions/logp checksummed into the carry so no work is
    dead): per-rollout dispatch over the tunnel under-reported the wall
    number ~3x vs the device anchor (BENCH_DETAIL r4 first cut: 14M wall
    vs 41M device on 2d-basic).
    """
    from tapnet_tpu.models import init_params
    from tapnet_tpu.env import sample_batch
    from tapnet_tpu.train.rollout import rollout_batch_record

    key = jax.random.key(0)
    params = init_params(key, cfg, hidden)["actor"]
    instances = sample_batch(key, batch, cfg)
    group = max(1, min(group, iters))

    @jax.jit
    def policy_rollout_call(p, i, keys_g):
        def body(acc, k):
            _, rec, logp = rollout_batch_record(p, i, k, cfg, hidden,
                                                step_kernel=step_kernel)
            return (acc[0] + rec.action.sum(), acc[1] + logp.sum()), None
        return jax.lax.scan(body, (jnp.int32(0), jnp.float32(0)), keys_g)[0]

    n_calls = max(1, iters // group)
    key_groups = [
        jnp.stack([jax.random.split(jax.random.key(1 + i * group + g), batch)
                   for g in range(group)])
        for i in range(n_calls * runs)]
    jax.block_until_ready(key_groups)
    jax.block_until_ready(policy_rollout_call(params, instances,
                                              key_groups[0]))
    out = _stats(_timed_windows(
        lambda i: policy_rollout_call(params, instances, key_groups[i]),
        n_calls, runs, batch * cfg.num_blocks * group), batch, iters)
    dev = _try_device_ms(
        lambda: policy_rollout_call(params, instances, key_groups[0]),
        "policy_rollout_call")
    if dev:
        out["device_ms_per_rollout"] = round(dev / group, 3)
        out["device_env_steps_per_s"] = round(
            batch * cfg.num_blocks / (dev / group / 1e3), 1)
    return out
