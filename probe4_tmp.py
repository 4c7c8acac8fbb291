import time, jax, jax.numpy as jnp
from pic1dp_tpu.config import bump_on_tail_default, DepositMethod
from pic1dp_tpu.ops import pallas_kernels as pk

n = 2**26
cfg = bump_on_tail_default(nx=1024, nparticle_max=n, dtype="float32",
                           deposit_method=DepositMethod.PALLAS, verbosity=0)
sub1 = pk.make_substep_call(cfg, 0, 0.5, False, n)
sub2 = pk.make_substep_call(cfg, 0, 1.0, True, n)
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (n,), jnp.float32) * cfg.lx
v = jax.random.uniform(key, (n,), jnp.float32) * 10 - 5
p = jnp.ones((n,), jnp.float32) * 1e-4
w = jnp.ones((n,), jnp.float32) * 1e-8
mre = jnp.ones((1,), jnp.float32)*1e-5; mim = jnp.ones((1,), jnp.float32)*1e-5

@jax.jit
def chain1(x0):
    def body(c, _):
        o = sub1(c, v, p, w, mre, mim)
        return o[0], o[3][0,0]
    xn, projs = jax.lax.scan(body, x0, None, length=20)
    return xn, projs
o = chain1(x); jax.block_until_ready(o[0]); print("compiled chain1")
t0=time.perf_counter(); o = chain1(x); jax.block_until_ready(o[0])
print(f"sub1 chained: {(time.perf_counter()-t0)/20*1e3:.2f} ms/iter")

@jax.jit
def chain2(x0):
    def body(c, _):
        o = sub2(c, v, p, w, x, v, w, mre, mim)
        return o[0], o[3][0,0]
    xn, projs = jax.lax.scan(body, x0, None, length=20)
    return xn, projs
o = chain2(x); jax.block_until_ready(o[0]); print("compiled chain2")
t0=time.perf_counter(); o = chain2(x); jax.block_until_ready(o[0])
print(f"sub2 chained: {(time.perf_counter()-t0)/20*1e3:.2f} ms/iter")
