import numpy as np, jax, jax.numpy as jnp, time
from artalk_tpu.utils.assets import synthetic_flame
from artalk_tpu.models.renderer import MeshRenderer
from artalk_tpu.ops.rasterizer import rasterize

data = synthetic_flame()
r = MeshRenderer(image_size=512, faces=data["faces"], scale=1.0)
rng = np.random.default_rng(0)
verts = jnp.asarray(data["v_template"][None] + rng.normal(0, 0.001, (25, 5023, 3)).astype(np.float32))

def timeit(name, fn, *a):
    out = jax.device_get(fn(*a))
    t0=time.time()
    for _ in range(5): out = jax.device_get(fn(*a))
    print(name, round((time.time()-t0)/5*1000,1), "ms")
    return out

# full batch render
timeit("full render 25f", r._render_batch, verts)

# rasterize only (single frame, vmapped)
vs = jax.jit(jax.vmap(r.camera_transform))(verts)
f_raster = jax.jit(jax.vmap(lambda v: rasterize(v, r.faces, height=512, width=512)))
timeit("raster only 25f", f_raster, vs)

# normals only
timeit("normals 25f", jax.jit(r.vertex_normals), verts)

# barycentric+shade
zb, fid = f_raster(vs)
f_shade = jax.jit(jax.vmap(lambda v, vsc, fi: r._shade(v, r.vertex_normals(v[None])[0], fi, r._barycentrics(vsc, fi))))
timeit("shade 25f", f_shade, verts, vs, fid)
