import os, time
import jax, jax.numpy as jnp, numpy as np
from akari_render_tpu.scene import load_scene
from akari_render_tpu.integrators.pt import _render_pass_fn
from akari_render_tpu.integrators.common import PTSettings
from akari_render_tpu.core.film import Film
from akari_render_tpu.core.filters import GaussianFilter

RES = 512
scene = load_scene('/root/repo/scenes/matbox/scene.json', width=RES, height=RES)
print('kinds:', len(scene.kinds), 'tris:', scene.num_tris, 'platform:', jax.devices()[0].platform)
settings = PTSettings(max_depth=7, rr_depth=5)

def bench(mode, spp=4):
    os.environ['AKR_SORT_DISPATCH'] = mode
    fn = _render_pass_fn(scene, settings, GaussianFilter(1.5), RES, RES, 1)
    film = Film.new(RES, RES)
    film = fn(scene.arrays, film, jnp.uint32(0))
    jax.block_until_ready(film)  # compile+warm
    t0 = time.time()
    for i in range(1, 1+spp):
        film = fn(scene.arrays, film, jnp.uint32(i))
    jax.block_until_ready(film)
    dt = (time.time() - t0) / spp
    mpaths = RES*RES*(settings.max_depth+1)/dt/1e6
    print(f'mode={mode}: {dt:.3f}s/spp, {mpaths:.3f} Mpaths/s (upper-bound depth)')
    return dt

d0 = bench('0')
d1 = bench('1')
print(f'speedup: {d0/d1:.2f}x')
