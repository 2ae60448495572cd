import numpy as np, time, jax
from artalk_tpu.engine import ARTAvatarInferEngine
t0=time.time()
eng = ARTAvatarInferEngine(load_gaga=True, clip_length=750)
print("engine+gaga init:", round(time.time()-t0,1), "s", flush=True)
print("avatars:", list(eng.gagavatar.all_gagavatar_id), flush=True)
rng = np.random.default_rng(0)
audio = (rng.standard_normal(16000)*0.1).astype(np.float32)  # 1 s
motions = eng.inference(audio)
print("motions:", motions.shape, flush=True)
t0=time.time()
out = eng.rendering(audio, motions[:5], shape_id="synthetic_0", save_name="gaga_smoke")
print("gaga render 5 frames:", round(time.time()-t0,1), "s ->", out, flush=True)
t0=time.time()
out = eng.rendering(audio, motions[:5], shape_id="synthetic_0", save_name="gaga_smoke2")
print("gaga render 5 frames warm:", round(time.time()-t0,1), "s", flush=True)
