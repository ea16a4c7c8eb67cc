"""otlp:/otap: listen-URI parser — equivalent of the reference's
``otlp_uri_parser`` scalar function (reference: src/otlp_uri.cpp:44-136).

Semantics matched: ``otap:`` selects gRPC and defaults to port 4317,
``otlp:`` selects HTTP and defaults to 4318; ``scheme:`` and
``scheme://`` both accepted; empty remainder -> localhost; ``[v6]``
bracket syntax; port must be 1-65535.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_HOST_RE = re.compile(r"^[A-Za-z0-9._-]+$")
_V6_RE = re.compile(r"^[0-9A-Fa-f:.%]+$")


@dataclass(frozen=True)
class OtlpUri:
    scheme: str
    host: str
    port: int
    ipv6: bool

    @property
    def url(self) -> str:
        h = f"[{self.host}]" if self.ipv6 else self.host
        return f"http://{h}:{self.port}"

    @property
    def canonical(self) -> str:
        h = f"[{self.host}]" if self.ipv6 else self.host
        return f"{self.scheme}://{h}:{self.port}"


def _parse_port(s: str, allow_ephemeral: bool) -> int:
    if not s.isdigit():
        raise ValueError("Invalid OTLP listen port")
    p = int(s)
    lo = 0 if allow_ephemeral else 1
    if not (lo <= p <= 65535):
        raise ValueError("Invalid OTLP listen port")
    return p


def parse_otlp_uri(uri: str, allow_ephemeral: bool = False) -> OtlpUri:
    """``allow_ephemeral=True`` additionally accepts port 0 (OS-assigned
    listen port, server-internal); the default matches the reference's
    strict 1-65535 rule (src/otlp_uri.cpp:44-104)."""
    uri = uri.strip()
    if uri.startswith("otap://"):
        scheme, default_port, rest = "otap", 4317, uri[len("otap://"):]
    elif uri.startswith("otap:"):
        scheme, default_port, rest = "otap", 4317, uri[len("otap:"):]
    elif uri.startswith("otlp://"):
        scheme, default_port, rest = "otlp", 4318, uri[len("otlp://"):]
    elif uri.startswith("otlp:"):
        scheme, default_port, rest = "otlp", 4318, uri[len("otlp:"):]
    else:
        raise ValueError(
            "Invalid OTLP listen URI, needs to start with 'otlp:' or 'otap:'")
    port = default_port
    if not rest:
        rest = "localhost"
    if rest.startswith("["):
        if "]" not in rest:
            raise ValueError("Invalid IPv6 OTLP URI, missing ']'")
        host, _, tail = rest[1:].partition("]")
        if not host:
            raise ValueError("Missing IPv6 address")
        if not _V6_RE.match(host):
            raise ValueError("Invalid IPv6 OTLP listen hostname")
        tail = tail[1:] if tail.startswith(":") else tail
        if tail:
            port = _parse_port(tail, allow_ephemeral)
        return OtlpUri(scheme, host, port, True)
    if ":" in rest:
        rest, _, port_str = rest.partition(":")
        port = _parse_port(port_str, allow_ephemeral)
    if not rest:
        raise ValueError("Missing OTLP listen hostname")
    if not _HOST_RE.match(rest):
        raise ValueError("Invalid OTLP listen hostname")
    return OtlpUri(scheme, rest, port, False)


def otlp_uri_parser(col: Column) -> Column:
    """Column flavor: VARCHAR -> STRUCT(host, port, ipv6, url), expressed
    with built-in string functions (no UDF). Invalid URIs raise, matching
    the reference's scalar function errors."""
    uri = F.trim(col)
    is_otap = uri.startswith("otap:")
    is_otlp = uri.startswith("otlp:")
    rest = F.regexp_replace(uri, r"^(otap|otlp):(//)?", "")
    rest = F.when(rest == "", F.lit("localhost")).otherwise(rest)
    default_port = F.when(is_otap, F.lit(4317)).otherwise(F.lit(4318))

    is_v6 = rest.startswith("[")
    v6_host = F.regexp_extract(rest, r"^\[([^\]]*)\]", 1)
    v6_port = F.regexp_extract(rest, r"^\[[^\]]*\]:?(\d*)$", 1)
    plain_host = F.regexp_extract(rest, r"^([^:]*)(:.*)?$", 1)
    plain_port = F.regexp_extract(rest, r"^[^:]*:(.*)$", 1)

    host = F.when(is_v6, v6_host).otherwise(plain_host)
    port_str = F.when(is_v6, v6_port).otherwise(plain_port)
    port_n = port_str.try_cast("int")
    port = F.when(port_str == "", default_port).otherwise(port_n)

    bad = (
        (~is_otap & ~is_otlp)
        | (host == "")
        | ((port_str != "") & (port_n.isNull() | (port_n < 1) | (port_n > 65535)))
        | (is_v6 & ~rest.rlike(r"^\[[0-9A-Fa-f:.%]+\](:\d+)?$"))
        | (~is_v6 & ~host.rlike(r"^[A-Za-z0-9._-]+$"))
    )
    url = F.concat(F.lit("http://"),
                   F.when(is_v6, F.concat(F.lit("["), host, F.lit("]"))).otherwise(host),
                   F.lit(":"), port.cast("string"))
    return (
        F.when(bad, F.raise_error(F.concat(F.lit("Invalid OTLP listen URI: "), uri)))
        .otherwise(F.struct(host.alias("host"),
                            port.cast("int").alias("port"),
                            is_v6.alias("ipv6"),
                            url.alias("url")))
    )
