"""Measure the remote-attached chip's host<->device link costs, and
whether program dispatch is asynchronous.

The round-3 serving profile (bench_engine_serving.py 32 32) showed
~300 ms host-blocking per horizon DISPATCH and ~230 ms per FETCH of a
2 KB output — both far above the ~16 ms/step device time. This tool
separates the constituents so the engine can be shaped around them:

  1. upload RTT      — jnp.asarray of a [32, 128] int32 host table
  2. dispatch wall   — calling an already-compiled jitted program
                       (tiny vs heavy: if heavy-dispatch ~= heavy-total,
                       execution is SYNCHRONOUS on this backend and
                       pipelining cannot overlap device work)
  3. fetch RTT       — np.asarray of a tiny completed device buffer
  4. chained dispatch amortization — K dispatches then one fetch
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
t0 = time.time()
print("alive:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))),
      f"{time.time()-t0:.1f}s", flush=True)

REPS = 12


def p50(xs):
    return float(np.percentile(xs, 50))


# -- 1. upload RTT -----------------------------------------------------------
host_tab = np.zeros((32, 128), dtype=np.int32)
ts = []
for _ in range(REPS):
    t0 = time.time()
    d = jnp.asarray(host_tab)
    ts.append(time.time() - t0)
# NOTE: asarray may return before the bytes land; separately time an
# upload made visible by an immediate dependent dispatch+fetch.
print(f"upload [32,128]i32 asarray-wall     p50 {p50(ts)*1e3:7.1f} ms",
      flush=True)

tiny = jnp.ones((8,), dtype=jnp.float32)


@jax.jit
def tiny_fn(x):
    return x + 1.0


@jax.jit
def heavy_fn(x):
    # ~256 chained [1024,1024]x[1024,1024] bf16 matmuls ~ 0.28 ms device
    # time at 197 TFLOP/s... make it 2048 iters for ~2.2 s: unambiguous.
    def body(i, x):
        return jnp.tanh(x @ x) * 0.5 + x * 0.5
    return jax.lax.fori_loop(0, 2048, body, x)


big = jnp.ones((1024, 1024), dtype=jnp.bfloat16)
tiny_fn(tiny); heavy_fn(big)                      # compile
np.asarray(tiny_fn(tiny)); float(np.asarray(heavy_fn(big))[0, 0])  # settle

# -- 2. dispatch wall --------------------------------------------------------
ts = []
for _ in range(REPS):
    t0 = time.time()
    y = tiny_fn(tiny)
    ts.append(time.time() - t0)
np.asarray(y)
print(f"tiny dispatch wall                  p50 {p50(ts)*1e3:7.1f} ms",
      flush=True)

t0 = time.time()
y = heavy_fn(big)
t_disp = time.time() - t0
_ = np.asarray(y)
t_total = time.time() - t0
print(f"heavy dispatch wall {t_disp*1e3:9.1f} ms   total (disp+exec+fetch) "
      f"{t_total*1e3:9.1f} ms", flush=True)
print(f"  -> execution is {'SYNCHRONOUS' if t_disp > 0.8 * t_total else 'async'}"
      f" on this link", flush=True)

# -- 3. fetch RTT on a COMPLETED tiny buffer ---------------------------------
y = tiny_fn(tiny)
np.asarray(y)                     # force completion + first fetch
ts = []
for _ in range(REPS):
    t0 = time.time()
    _ = np.asarray(y)             # re-fetch: device work all done
    ts.append(time.time() - t0)
print(f"re-fetch completed tiny buffer      p50 {p50(ts)*1e3:7.1f} ms",
      flush=True)

y2 = tiny_fn(tiny)                # fresh buffer, never fetched
time.sleep(0.5)                   # ensure execution finished
t0 = time.time()
_ = np.asarray(y2)
print(f"first-fetch completed tiny buffer       {1e3*(time.time()-t0):7.1f} ms",
      flush=True)

# -- 4. chained dispatches, one fetch ---------------------------------------
for k in (1, 4, 8):
    t0 = time.time()
    x = tiny
    for _ in range(k):
        x = tiny_fn(x)
    _ = np.asarray(x)
    print(f"chain k={k:2d} dispatch+1 fetch wall      "
          f"{1e3*(time.time()-t0):7.1f} ms", flush=True)

# -- 5. upload visible-latency: upload -> dependent dispatch -> fetch --------
ts = []
for i in range(REPS):
    host_tab[0, 0] = i
    t0 = time.time()
    d = jnp.asarray(host_tab)
    v = tiny_fn(d[0, :8].astype(jnp.float32))
    _ = np.asarray(v)
    ts.append(time.time() - t0)
print(f"upload+dispatch+fetch round trip    p50 {p50(ts)*1e3:7.1f} ms",
      flush=True)
print("done", flush=True)

# -- 6. in-flight program limit: back-to-back heavy dispatches ---------------
print("-- in-flight limit --", flush=True)
x1 = heavy_fn(big)
t0 = time.time()
x2 = heavy_fn(big)
print(f"2nd heavy dispatch wall   {1e3*(time.time()-t0):7.1f} ms", flush=True)
t0 = time.time()
x3 = heavy_fn(big)
print(f"3rd heavy dispatch wall   {1e3*(time.time()-t0):7.1f} ms", flush=True)
t0 = time.time()
_ = np.asarray(x3)
print(f"fetch 3rd                 {1e3*(time.time()-t0):7.1f} ms", flush=True)
print("done2", flush=True)
