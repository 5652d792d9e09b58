"""Thread-local precision context.

Mirrors the semantics of buzzard's ``buzz.env`` / ``buzz.Env``
(reference: buzzard/_env.py:28-34): three options with the same defaults.
Implemented as a plain thread-local stack — the engine only needs
``significant`` (float decimal digits), ``default_index_dtype`` and
``allow_complex_footprint``.

Inside Spark executors each python worker gets its own thread-local; the
engine never mutates the env mid-job, so defaults rule on the cluster.
"""

from __future__ import annotations

import threading

import numpy as np

_DEFAULTS = {
    'significant': 9.0,
    'default_index_dtype': np.dtype('int32'),
    'allow_complex_footprint': False,
}


class _EnvState(threading.local):
    def __init__(self):
        self.stack = [dict(_DEFAULTS)]


_state = _EnvState()


class _EnvProxy:
    """Read-only attribute access to the innermost env frame."""

    @property
    def significant(self) -> float:
        return _state.stack[-1]['significant']

    @property
    def default_index_dtype(self) -> np.dtype:
        return _state.stack[-1]['default_index_dtype']

    @property
    def allow_complex_footprint(self) -> bool:
        return _state.stack[-1]['allow_complex_footprint']


env = _EnvProxy()


class Env:
    """Context manager pushing option overrides, e.g. ``with Env(significant=12): ...``"""

    def __init__(self, **kwargs):
        frame = {}
        for key, val in kwargs.items():
            if key == 'significant':
                val = float(val)
                if val <= 0:
                    raise ValueError('Significant should be greater than 0')
            elif key == 'default_index_dtype':
                val = np.dtype(val)
                if val.kind not in 'iu':
                    raise ValueError('%s cannot be used as an index dtype' % val)
            elif key == 'allow_complex_footprint':
                val = bool(val)
            else:
                raise ValueError('Unknown env option %r' % key)
            frame[key] = val
        self._frame = frame

    def __enter__(self):
        merged = dict(_state.stack[-1])
        merged.update(self._frame)
        _state.stack.append(merged)
        return env

    def __exit__(self, *exc):
        _state.stack.pop()
        return False
