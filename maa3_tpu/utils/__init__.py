import os


def enable_compile_cache(path: str = None) -> None:
    """Persistent XLA compilation cache (subsequent runs skip the multi-minute
    XL compiles). Safe to call multiple times."""
    import jax
    path = path or os.environ.get(
        "MAA3_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "maa3_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compile cache disabled: {e}")