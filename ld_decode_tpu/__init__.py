"""ld-decode-tpu: TPU-native LaserDisc RF decode framework."""

import os

# The sandbox TPU backend remote-compiles every kernel (10-600s each,
# erratic); the persistent compilation cache works through it and makes
# warm starts ~instant.  Disable with LDD_TPU_COMPILE_CACHE=0.
if os.environ.get('LDD_TPU_COMPILE_CACHE', '1') != '0':
    try:
        import jax

        _cache = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                os.path.expanduser('~/.cache/ldd_tpu_jax'))
        os.makedirs(_cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', _cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
