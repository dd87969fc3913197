"""Annotation-driven runtime type assertions (reference
utils/typecheck.py:8-288).

``@TypeCheck()`` validates argument annotations at call time; with
``arithmetic=True`` mismatches return NotImplemented (so operator dispatch
can fall through) instead of raising. Disabled under ``python -O`` or env
``DISABLE_TYPECHECKING`` exactly like the reference.
"""

from __future__ import annotations

import inspect
import os
from functools import wraps

_DISABLED = (not __debug__) or bool(os.environ.get("DISABLE_TYPECHECKING"))


class TypeCheck:
    def __init__(self, arithmetic: bool = False):
        self.arithmetic = arithmetic

    def __call__(self, func):
        if _DISABLED:
            return func
        sig = inspect.signature(func)
        hints = {k: v.annotation for k, v in sig.parameters.items()
                 if v.annotation is not inspect.Parameter.empty}

        def check(bound):
            for name, ann in hints.items():
                if name not in bound.arguments:
                    continue
                val = bound.arguments[name]
                if isinstance(ann, str):
                    # string annotations: look up in func globals best-effort
                    ann_t = func.__globals__.get(ann)
                    if ann_t is None:
                        continue
                    ann = ann_t
                if isinstance(ann, tuple):
                    ok = isinstance(val, tuple(a for a in ann
                                               if isinstance(a, type)))
                elif isinstance(ann, type):
                    ok = isinstance(val, ann)
                else:
                    continue
                if not ok:
                    return name, val
            return None

        if inspect.iscoroutinefunction(func):
            @wraps(func)
            async def awrapper(*args, **kwargs):
                bound = sig.bind(*args, **kwargs)
                bad = check(bound)
                if bad is not None:
                    if self.arithmetic:
                        return NotImplemented
                    raise TypeError(
                        f"{func.__qualname__}: argument {bad[0]} has type "
                        f"{type(bad[1]).__name__}")
                return await func(*args, **kwargs)
            return awrapper

        @wraps(func)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            bad = check(bound)
            if bad is not None:
                if self.arithmetic:
                    return NotImplemented
                raise TypeError(
                    f"{func.__qualname__}: argument {bad[0]} has type "
                    f"{type(bad[1]).__name__}")
            return func(*args, **kwargs)
        return wrapper
