import jax, numpy as np, jax.numpy as jnp, time
rng = np.random.default_rng(0)
from artalk_tpu.ops.gsplat import rasterize_gaussians
N, size = 180255, 512
head = rng.normal(0, 0.3, (5023,3))
plane = np.stack(np.meshgrid(np.linspace(-.8,.8,296), np.linspace(-.8,.8,296)), -1).reshape(-1,2)
p0 = np.concatenate([plane, np.full((87616,1), 0.05)], 1)
p1 = np.concatenate([plane, np.full((87616,1), -0.05)], 1)
xyz = np.concatenate([head, p0, p1]).astype(np.float32)
colors = rng.random((N,32)).astype(np.float32)
opac = (rng.random((N,1))*0.6+0.2).astype(np.float32)
scales = (rng.random((N,3))*0.02+0.002).astype(np.float32)
q = np.zeros((N,4), np.float32); q[:,0]=1
cam = np.array([[-1,0,0,0],[0,1,0,0],[0,0,-1,5000.0/512]], np.float32)
args = [jnp.asarray(a) for a in (xyz, colors, opac, scales, q, cam)]
t0=time.time()
out = jax.device_get(rasterize_gaussians(*args, focal=12.0, size=size))
print("compile+first run:", round(time.time()-t0,1), flush=True)
for i in range(5):
    t0=time.time()
    out = jax.device_get(rasterize_gaussians(*args, focal=12.0, size=size))
    print(f"frame {i}: {round((time.time()-t0)*1000,1)} ms", flush=True)
print("coverage:", round(float((out.sum(0)>0.01).mean()),3), flush=True)
