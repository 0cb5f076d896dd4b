"""Tests for the persistent compile-cache setup (splice_tpu/utils/cache.py)."""
import jax

from splice_tpu.utils.cache import enable_compile_cache


class TestEnableCompileCache:
    def test_respects_existing_process_setting(self, tmp_path):
        # conftest already configured a cache dir for the test process;
        # entry points must not override an explicit setting.
        prev = jax.config.jax_compilation_cache_dir
        assert prev  # conftest sets it
        enable_compile_cache(str(tmp_path / "other"))
        assert jax.config.jax_compilation_cache_dir == prev

    def test_sets_creates_and_disables(self, tmp_path):
        prev = jax.config.jax_compilation_cache_dir
        target = tmp_path / "sub" / "cache"
        try:
            jax.config.update("jax_compilation_cache_dir", None)
            enable_compile_cache(str(target))
            assert jax.config.jax_compilation_cache_dir == str(target)
            assert target.is_dir()

            jax.config.update("jax_compilation_cache_dir", None)
            enable_compile_cache("")  # falsy path disables
            assert jax.config.jax_compilation_cache_dir is None

            jax.config.update("jax_compilation_cache_dir", None)
            enable_compile_cache(None)
            assert jax.config.jax_compilation_cache_dir is None
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    def test_expands_home(self, tmp_path, monkeypatch):
        prev = jax.config.jax_compilation_cache_dir
        monkeypatch.setenv("HOME", str(tmp_path))
        try:
            jax.config.update("jax_compilation_cache_dir", None)
            enable_compile_cache("~/xc")
            assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xc")
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
