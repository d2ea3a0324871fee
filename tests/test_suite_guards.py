"""Regression guards for the suite's own process hygiene.

Round-5 root cause: the single-process suite segfaulted deterministically
(~test 388) inside XLA executable (de)serialization once the process
crossed Linux's vm.max_map_count (default 65530) — every live JIT'd
XLA:CPU module holds ~3 anonymous mappings per device and nothing ever
released them. conftest's _map_count_guard clears JAX's executable caches
between modules via piper_tpu.utils.procmaps; these tests pin that
machinery so it cannot silently rot.
"""

import threading

import piper_tpu.utils.procmaps as procmaps


def test_map_count_positive():
    # On the Linux CI/dev boxes this must see real mappings; the helper
    # returning 0 would silently disable the guard.
    assert procmaps.map_count() > 10


def test_guard_no_clear_below_threshold(monkeypatch):
    calls = []
    monkeypatch.setattr(procmaps.jax, "clear_caches",
                        lambda: calls.append(1))
    assert procmaps.clear_jit_caches_if_crowded(threshold=10**9) is False
    assert not calls


def test_guard_clears_above_threshold(monkeypatch):
    calls = []
    monkeypatch.setattr(procmaps.jax, "clear_caches",
                        lambda: calls.append(1))
    assert procmaps.clear_jit_caches_if_crowded(threshold=0) is True
    assert calls == [1]


def test_worker_threads_are_named():
    """The thread-hygiene fixture identifies leaked device workers by the
    piper- name prefix; an unnamed worker would escape it. Pin the names
    at their construction sites."""
    import inspect

    from piper_tpu.engine import batcher, stream_server, unified

    src = inspect.getsource(batcher)
    assert 'name="piper-batch-server"' in src
    assert 'name="piper-mv-server"' in src
    assert 'name="piper-stream-server"' in inspect.getsource(stream_server)
    assert 'name="piper-unified-server"' in inspect.getsource(unified)


def test_no_piper_threads_alive_right_now():
    # Mid-suite spot check — every server torn down by earlier modules
    # must have joined (shutdown now fails stuck sessions after a grace
    # instead of leaking its worker).
    leaked = [t.name for t in threading.enumerate()
              if t.name.startswith("piper-")]
    assert not leaked, f"leaked piper worker threads: {leaked}"
