import sys, functools, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
WINDOW=256
I=91_600; D=128
ROWS_TOTAL=64*1024
ITERS=50
def kern(ids_ref, table_ref, out_ref, sems, *, r, tile):
    def make_copy(k, slot):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(ids_ref[k]*r, r)],
            out_ref.at[pl.ds(k*r, r)],
            sems.at[slot])
    def body(k,_):
        @pl.when(k>=WINDOW)
        def _():
            make_copy(k-WINDOW,(k-WINDOW)%WINDOW).wait()
        make_copy(k,k%WINDOW).start()
        return 0
    jax.lax.fori_loop(0, tile, body, 0)
    def tail(k,_):
        make_copy(k,k%WINDOW).wait()
        return 0
    jax.lax.fori_loop(max(0,tile-WINDOW), tile, tail, 0)

for r in (1,2,4,8,16):
    try:
        n_desc = ROWS_TOTAL//r
        tile = 1024
        grid = n_desc//tile
        nblk = I//r
        k = functools.partial(kern, r=r, tile=tile)
        def gather_blocks(table, ids, k=k, grid=grid, tile=tile, r=r, n_desc=n_desc):
            return pl.pallas_call(k, grid=(grid,),
                in_specs=[pl.BlockSpec((tile,), lambda i:(i,), memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((tile*r,D), lambda i:(i,0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_desc*r,D), jnp.float32),
                scratch_shapes=[pltpu.SemaphoreType.DMA((WINDOW,))])(ids, table)
        def body(carry, key, nblk=nblk, n_desc=n_desc, gather_blocks=gather_blocks):
            ids = jax.random.randint(key,(n_desc,),0,nblk,dtype=jnp.int32)
            out = gather_blocks(carry, ids)
            return carry, out.ravel()[0]
        fn = jax.jit(lambda c, ks: jax.lax.scan(body, c, ks))
        keys = jax.random.split(jax.random.key(1), ITERS)
        table = jnp.zeros((I,D), jnp.float32)
        out = fn(table, keys); _=float(out[1][0])
        t0=time.perf_counter(); out=fn(table, keys); _=float(out[1][0])
        dt=(time.perf_counter()-t0)/ITERS
        print(f"r={r:2d}: {dt*1e3:8.3f} ms/step ({dt/ROWS_TOTAL*1e9:6.2f} ns/row, {dt/n_desc*1e9:6.1f} ns/descriptor)")
    except Exception as e:
        print(f"r={r}: FAILED {type(e).__name__}: {str(e)[:160]}")
