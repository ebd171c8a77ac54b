import time, jax, jax.numpy as jnp
import numpy as np
from functools import partial

print(jax.devices())

def timeit(f, *args, iters=20):
    r = f(*args); jax.block_until_ready(r); _ = float(jnp.sum(jnp.asarray(r, jnp.float32)[..., :1].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jnp.asarray(r, jnp.float32)[..., :1].ravel()[:1]))
    return (time.perf_counter() - t0) / iters * 1000

key = jax.random.PRNGKey(0)
# Matmul probe at LSTM-ish shape [N, C] @ [C, 4C]
N, C = 50176, 64
a_f = jax.random.normal(key, (N, C), jnp.bfloat16)
b_f = jax.random.normal(key, (C, 4 * C), jnp.bfloat16)
a_i = jnp.asarray(jax.random.randint(key, (N, C), -127, 127), jnp.int8)
b_i = jnp.asarray(jax.random.randint(key, (C, 4 * C), -127, 127), jnp.int8)

@jax.jit
def mm_bf16(a, b):
    def body(c, _):
        return jnp.dot(c, b), None
    out, _ = jax.lax.scan(body, a, None, length=10)
    return out
@jax.jit
def mm_int8(a, b):
    def body(c, _):
        o = jax.lax.dot_general(c, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return jnp.asarray(jnp.clip(o >> 6, -127, 127), jnp.int8), None
    out, _ = jax.lax.scan(body, a, None, length=10)
    return out

# need square for scan carry; use C=4C? simpler: single big matmul timed via chained variants
M = 4096
x_f = jax.random.normal(key, (M, M), jnp.bfloat16)
y_f = jax.random.normal(key, (M, M), jnp.bfloat16)
x_i = jnp.asarray(jax.random.randint(key, (M, M), -127, 127), jnp.int8)
y_i = jnp.asarray(jax.random.randint(key, (M, M), -127, 127), jnp.int8)

@jax.jit
def big_bf16(x, y):
    def body(c, _):
        return jnp.dot(c, y, preferred_element_type=jnp.bfloat16), None
    o, _ = jax.lax.scan(body, x, None, length=20)
    return o

@jax.jit
def big_int8(x, y):
    def body(c, _):
        o = jax.lax.dot_general(c, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return jnp.asarray(jnp.clip(o >> 12, -127, 127), jnp.int8), None
    o, _ = jax.lax.scan(body, x, None, length=20)
    return o

t_bf = timeit(big_bf16, x_f, y_f, iters=5)
t_i8 = timeit(big_int8, x_i, y_i, iters=5)
flop = 2 * M**3 * 20
print(f"matmul 4096^3 x20: bf16 {t_bf:.2f} ms ({flop/t_bf/1e9:.0f} GF/s)  int8 {t_i8:.2f} ms ({flop/t_i8/1e9:.0f} GOP/s)")

# Conv probe: NHWC int8 conv
B, H, W, Cin, Cout = 16, 56, 56, 64, 64
img_f = jax.random.normal(key, (B, H, W, Cin), jnp.bfloat16)
ker_f = jax.random.normal(key, (3, 3, Cin, Cout), jnp.bfloat16)
img_i = jnp.asarray(jax.random.randint(key, (B, H, W, Cin), -127, 127), jnp.int8)
ker_i = jnp.asarray(jax.random.randint(key, (3, 3, Cin, Cout), -127, 127), jnp.int8)
dn = jax.lax.conv_dimension_numbers(img_f.shape, ker_f.shape, ("NHWC", "HWIO", "NHWC"))

@jax.jit
def conv_bf16(x, k):
    def body(c, _):
        return jax.lax.conv_general_dilated(c, k, (1, 1), "SAME", dimension_numbers=dn), None
    o, _ = jax.lax.scan(body, x, None, length=20)
    return o

@jax.jit
def conv_int8(x, k):
    def body(c, _):
        o = jax.lax.conv_general_dilated(c, k, (1, 1), "SAME", dimension_numbers=dn, preferred_element_type=jnp.int32)
        return jnp.asarray(jnp.clip(o >> 10, -127, 127), jnp.int8), None
    o, _ = jax.lax.scan(body, x, None, length=20)
    return o

t_cbf = timeit(conv_bf16, img_f, ker_f, iters=5)
try:
    t_ci8 = timeit(conv_int8, img_i, ker_i, iters=5)
except Exception as e:
    t_ci8 = None
    print("int8 conv FAILED:", repr(e)[:300])
cflop = 2 * B * H * W * Cin * Cout * 9 * 20
print(f"conv 3x3 64ch@56^2 x20: bf16 {t_cbf:.2f} ms ({cflop/t_cbf/1e9:.0f} GF/s)" + (f"  int8 {t_ci8:.2f} ms ({cflop/t_ci8/1e9:.0f} GOP/s)" if t_ci8 else ""))
