import os, time
import jax, jax.numpy as jnp, numpy as np
from akari_render_tpu.scene import load_scene
from akari_render_tpu.integrators.pt import _render_pass_fn
from akari_render_tpu.integrators.common import PTSettings
from akari_render_tpu.core.film import Film
from akari_render_tpu.core.filters import GaussianFilter

RES = 512
scene = load_scene('/root/repo/scenes/matbox/scene.json', width=RES, height=RES)
def bench(tag, settings, spp=3):
    fn = _render_pass_fn(scene, settings, GaussianFilter(1.5), RES, RES, 1)
    film = Film.new(RES, RES)
    film = fn(scene.arrays, film, jnp.uint32(0)); jax.block_until_ready(film)
    t0 = time.time()
    for i in range(1, 1+spp):
        film = fn(scene.arrays, film, jnp.uint32(i))
    jax.block_until_ready(film)
    dt = (time.time()-t0)/spp
    print(f'{tag}: {dt:.3f}s/spp')
    return dt

os.environ['AKR_SORT_DISPATCH']='0'
full = bench('masked full', PTSettings(max_depth=7, rr_depth=5))
fd = bench('force_diffuse (intersect-bound floor)', PTSettings(max_depth=7, rr_depth=5, force_diffuse=True))
print(f'shade fraction: {(full-fd)/full:.2%}')
