"""Auth-plugin seam (reference: GoogleAuthentication.scala:33-74).

The reference models authentication as a named scheme resolved against
the live session's config into an HttpRequestInitializer that mutates
outgoing requests (adds credentials, widens timeouts). The same shape,
Python-side: an :class:`AuthProvider` initializes a request mapping;
providers register by scheme name and resolve with the SparkSession so
they can read ``spark.conf`` keys, exactly like
``GoogleAuthentication(Dbm, spark)``.

The interactive OAuth installed-app flow needs Google client libraries
that are intentionally not bundled; ``oauth_installed_app`` keeps the
reference's config contract (requires ``spark.google.cloud.auth.
client.file``, validates the file exists) and raises NotImplementedError
at the point where the external flow would launch.
"""

from __future__ import annotations

import os
from collections.abc import Callable, MutableMapping
from dataclasses import dataclass, field
from typing import Protocol, runtime_checkable

from pyspark.sql import SparkSession

#: request-mutation contract: a request is any mutable mapping of
#: attributes (headers, timeouts) — the Python stand-in for
#: HttpRequestInitializer.initialize(httpRequest)
Request = MutableMapping[str, object]


@runtime_checkable
class AuthProvider(Protocol):
    scopes: tuple[str, ...]

    def initialize(self, request: Request) -> None:
        """Mutate an outgoing request with credentials."""
        ...


@dataclass
class StaticTokenAuth:
    """Bearer-token provider — the injectable test/deploy double."""

    token: str
    scopes: tuple[str, ...] = ()

    def initialize(self, request: Request) -> None:
        request["authorization"] = f"Bearer {self.token}"


@dataclass
class WithTimeouts:
    """Decorator provider mirroring CustomHttpRequestInitializer
    (GoogleAuthentication.scala:67-74): delegate, then force wide
    connect/read timeouts (reference uses 10 minutes for both)."""

    wrapped: AuthProvider
    connect_timeout_s: int = 600
    read_timeout_s: int = 600
    scopes: tuple[str, ...] = field(default=())

    def __post_init__(self) -> None:
        self.scopes = tuple(self.wrapped.scopes)

    def initialize(self, request: Request) -> None:
        self.wrapped.initialize(request)
        request["connect_timeout_s"] = self.connect_timeout_s
        request["read_timeout_s"] = self.read_timeout_s


ProviderFactory = Callable[[SparkSession], AuthProvider]

_PROVIDERS: dict[str, ProviderFactory] = {}


def register_auth(scheme: str, factory: ProviderFactory) -> None:
    """Register a provider factory for a scheme name (the analog of
    adding a case to the GoogleAuthentication ADT)."""
    _PROVIDERS[scheme] = factory


def resolve_auth(scheme: str, spark: SparkSession) -> AuthProvider:
    """``GoogleAuthentication.apply``: look the scheme up and build the
    provider against the live session (so factories can read
    spark.conf)."""
    try:
        factory = _PROVIDERS[scheme]
    except KeyError:
        raise ValueError(
            f"no auth provider registered for scheme {scheme!r}; "
            f"known: {sorted(_PROVIDERS)}"
        ) from None
    return factory(spark)


DBM_SCOPE = "https://www.googleapis.com/auth/doubleclickbidmanager"


def oauth_installed_app(spark: SparkSession) -> AuthProvider:
    """The reference's Dbm case (GoogleAuthentication.scala:44-65):
    requires ``spark.google.cloud.auth.client.file`` to point at an
    existing client-secrets file, then runs the installed-app OAuth
    flow. The config contract is enforced here; the flow itself needs
    the (unbundled) Google client libraries."""
    client_file = spark.conf.get("spark.google.cloud.auth.client.file", None)
    if not client_file:
        raise ValueError("'spark.google.cloud.auth.client.file' not configured")
    if not os.path.exists(client_file):
        raise ValueError(f"{client_file} does not exist")
    raise NotImplementedError(
        "installed-app OAuth flow requires Google client libraries that are "
        "not bundled; register a custom provider via register_auth() "
        "(e.g. StaticTokenAuth with a pre-fetched token)"
    )


register_auth("dbm", oauth_installed_app)
