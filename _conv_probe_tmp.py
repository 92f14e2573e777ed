import time, sys
import jax, jax.numpy as jnp
t0=time.time()
from opticalflowdiffusion_tpu.ops.conv_pallas import conv2d_same
print("import", time.time()-t0, flush=True)
x = jnp.ones((8,128,128,64), jnp.bfloat16)
k = jnp.ones((3,3,64,64), jnp.bfloat16)
f = jax.jit(conv2d_same)
t0=time.time(); lowered = f.lower(x,k); print("lowered", time.time()-t0, flush=True)
t0=time.time(); comp = lowered.compile(); print("compiled", time.time()-t0, flush=True)
t0=time.time(); y = comp(x,k); y.block_until_ready(); print("ran", time.time()-t0, float(y.astype(jnp.float32).mean()), flush=True)
t0=time.time(); y = comp(x,k); y.block_until_ready(); print("ran2", time.time()-t0, flush=True)
