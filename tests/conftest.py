"""Shared fixtures: one Ray session per pytest session, and the
reference libs imported as a differential-test oracle.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used
strictly as a behavioral oracle; importing it requires two shims:
- modern urllib3 lacks ``util.ssl_.DEFAULT_CIPHERS`` which
  ``libs/functions.py:13-14`` mutates at import time;
- ``libs/logging.py:12,33`` creates a ``logs/`` directory next to
  ``sys.argv[0]`` — pointed at /tmp so nothing outside the sandbox's
  scratch area is touched.
"""

from __future__ import annotations

import os
import sys

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # Concurrent read_parquet calls from driver threads re-probe the
    # fsspec.implementations.http import (aiohttp is absent, so the
    # failure is never cached) and race Python's partial-module state
    # into an uncaught ImportError — same shim as
    # bench._thread_safe_reads.
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types

        _m = types.ModuleType("fsspec.implementations.http")
        _m.HTTPFileSystem = type("HTTPFileSystem", (), {})
        sys.modules["fsspec.implementations.http"] = _m
    yield
    ray.shutdown()


def _load_reference_libs():
    import urllib3.util.ssl_ as _ssl_mod

    if not hasattr(_ssl_mod, "DEFAULT_CIPHERS"):
        _ssl_mod.DEFAULT_CIPHERS = ""
    scratch = "/tmp/torray_oracle"
    os.makedirs(scratch, exist_ok=True)
    old_argv0 = sys.argv[0]
    sys.argv[0] = os.path.join(scratch, "oracle.py")
    sys.path.insert(0, "/root/reference")
    try:
        import libs.functions as ref_functions  # noqa: F401
        import libs.parsers as ref_parsers  # noqa: F401
    finally:
        sys.argv[0] = old_argv0
    return ref_functions, ref_parsers


@pytest.fixture(scope="session")
def ref():
    """Namespace holding the reference's parser/util functions."""
    functions, parsers = _load_reference_libs()

    class _Ref:
        get_title = staticmethod(parsers.get_title)
        get_links = staticmethod(parsers.get_links)
        get_forms = staticmethod(parsers.get_forms)
        merge_urls = staticmethod(functions.merge_urls)
        get_hash = staticmethod(functions.get_hash)
        get_type = staticmethod(functions.get_type)
        unique = staticmethod(functions.unique)
        merge_titles = staticmethod(functions.merge_titles)
        extract_exact = staticmethod(functions.extract_exact)
        prune_exact = staticmethod(functions.prune_exact)

    return _Ref
