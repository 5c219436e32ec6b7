import time, numpy as np, jax, jax.numpy as jnp
from wire_tpu.nn import get_inr

N, K = 65536, 50
base = dict(in_features=2, out_features=3, hidden_features=300,
            hidden_layers=2, first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
rng = np.random.RandomState(0)
coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))

def time_model(m):
    def body(p, _):
        pred, g = m.step_grads(p, coords, tgt)
        # data dependence so XLA can't hoist the loop body
        return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), pred[0, 0]
    run = jax.jit(lambda p: jax.lax.scan(body, p, None, length=K)[1][-1])
    p = m.init(jax.random.key(0))
    float(run(p))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(run(p))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

for store in ("f32", "bf16"):
    m = get_inr("wire", act_store=store, **base)
    print(f"act_store={store}: {time_model(m):.3f} ms/step", flush=True)
