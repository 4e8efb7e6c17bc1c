"""Resource-safe management (reference: ManagedIO, core/.../ManagedIO.scala:24-41).

The reference wraps AutoCloseable in a monadic bracket. Python's
idiomatic equivalent is contextlib; we expose the same composable
shape: ``managed`` guarantees close-on-exit (including on error), and
``Managed`` supports map/flat_map chaining like the reference's
for-comprehension usage."""

from __future__ import annotations

from collections.abc import Callable
from contextlib import ExitStack, contextmanager
from typing import Any, Generic, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")


@contextmanager
def managed(resource: T) -> Iterator[T]:
    """Bracket: yield the resource, close() it on the way out even when
    the body raises (ManagedIO.scala close-semantics matrix)."""
    try:
        yield resource
    finally:
        close = getattr(resource, "close", None)
        if callable(close):
            close()


class Managed(Generic[T]):
    """Composable resource: acquisition threads an ExitStack, so every
    resource acquired anywhere in a map/flat_map chain is closed by
    `use`, in reverse acquisition order, error-safe."""

    def __init__(self, acquire: Callable[[ExitStack], T]):
        self._acquire = acquire

    @classmethod
    def of(cls, factory: Callable[[], T]) -> "Managed[T]":
        def acquire(stack: ExitStack) -> T:
            resource = factory()
            close = getattr(resource, "close", None)
            if callable(close):
                stack.callback(close)
            return resource

        return cls(acquire)

    def map(self, fn: Callable[[T], U]) -> "Managed[U]":
        return Managed(lambda stack: fn(self._acquire(stack)))

    def flat_map(self, fn: Callable[[T], "Managed[U]"]) -> "Managed[U]":
        return Managed(lambda stack: fn(self._acquire(stack))._acquire(stack))

    def use(self, body: Callable[[T], U]) -> U:
        """Acquire → run body → close everything, error-safe."""
        with ExitStack() as stack:
            return body(self._acquire(stack))
