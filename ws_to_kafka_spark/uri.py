"""URI parsing with the reference's semantics.

The reference hand-rolls a parser (``/root/reference/src/uri.hpp:13-81``)
producing ``{Protocol, Host, Port, Path, QueryString}`` with default ports
443 for ``wss|https`` and 80 for ``ws|http`` (``src/uri.hpp:72-79``), path
defaulting to ``/`` and the query string split at ``?``
(``src/uri.hpp:62-70``). We use the stdlib parser and normalize to the same
shape. Query-level URI parsing parity for SQL queries is covered separately
by Spark's ``parse_url`` function (see operators/functions module).
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit

_DEFAULT_PORTS = {"wss": 443, "https": 443, "ws": 80, "http": 80}


@dataclass(frozen=True)
class Uri:
    protocol: str
    host: str
    port: int
    path: str
    query_string: str

    @property
    def resource(self) -> str:
        """Path + query, as handed to the websocket handshake
        (reference joins them the same way: src/uri.hpp:66-70)."""
        if self.query_string:
            return f"{self.path}?{self.query_string}"
        return self.path


def parse_uri(raw: str) -> Uri:
    """Parse ``raw`` into a :class:`Uri`, applying the reference's default
    port/path rules (src/uri.hpp:62-79)."""
    parts = urlsplit(raw)
    protocol = parts.scheme.lower()
    if not protocol or not parts.hostname:
        raise ValueError(f"unparseable uri: {raw!r}")
    port = parts.port or _DEFAULT_PORTS.get(protocol)
    if port is None:
        raise ValueError(f"no port and no default for protocol {protocol!r}")
    return Uri(
        protocol=protocol,
        host=parts.hostname,
        port=port,
        path=parts.path or "/",
        query_string=parts.query or "",
    )
