"""SSH tunnel for JDBC sources — config parity + local port forward.

The reference dials the database through an SSH bastion by overriding the
driver's DialFunc (utils/ssh.go:13-77, used at
drivers/postgres/internal/postgres.go:86-114). A JVM JDBC driver running
inside Spark executors has no injectable dialer, so the Spark-native
equivalent is a LOCAL PORT FORWARD: open the tunnel on the driver host,
rewrite the JDBC URL to ``localhost:<forwarded>``, and let every executor
connection ride it (in cluster mode the forward must run on a host all
executors reach — typically the bastion exposes the DB to the cluster
network instead, and this class only validates config).

``paramiko`` is not in this environment, so the live tunnel is gated behind
an import-try; config validation and URL rewriting (the parts the planner
needs) are pure Python and fully tested.
"""

from __future__ import annotations

import re
import socket
from dataclasses import dataclass

__all__ = ["SSHConfig", "tunneled_jdbc_url", "open_tunnel"]


@dataclass
class SSHConfig:
    """utils/ssh.go:13-20 field-for-field (JSON keys identical)."""

    host: str = ""
    port: int = 22
    username: str = ""
    private_key: str = ""
    passphrase: str = ""
    password: str = ""

    def validate(self) -> None:
        """utils/ssh.go:23-40 rule-for-rule."""
        if not self.host:
            raise ValueError("ssh host is required")
        if not (0 < self.port <= 65535):
            raise ValueError("invalid ssh port number: must be between 1 and 65535")
        if not self.username:
            raise ValueError("ssh username is required")
        if not self.private_key and not self.password:
            raise ValueError("private key or password is required")

    @classmethod
    def from_json(cls, doc: dict) -> "SSHConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in doc.items() if k in known})


_HOSTPORT = re.compile(r"//(?P<host>[^:/;@]+)(?::(?P<port>\d+))?")


def tunneled_jdbc_url(url: str, local_port: int, local_host: str = "127.0.0.1") -> str:
    """Rewrite a JDBC URL's host:port to the tunnel's local endpoint.

    Handles the ``jdbc:<scheme>://host:port/...`` family (postgres, mysql,
    mssql with ;-params, db2). Oracle thin ``@host:port`` URLs rewrite via
    the ``@`` form.
    """
    if ":@" in url or ":thin:@" in url:
        return re.sub(
            r"@(?://)?[^:/]+:(\d+)", f"@{local_host}:{local_port}", url, count=1
        )
    m = _HOSTPORT.search(url)
    if not m:
        raise ValueError(f"cannot find host in JDBC url: {url!r}")
    return url[: m.start()] + f"//{local_host}:{local_port}" + url[m.end() :]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def open_tunnel(cfg: SSHConfig, remote_host: str, remote_port: int):
    """Open the bastion connection + local forward. Requires ``paramiko``
    (absent here → clear NotImplementedError after config validation, so
    config errors surface before the dependency error)."""
    cfg.validate()
    try:
        import paramiko  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "SSH tunneling needs paramiko, which is not installed in this "
            "environment; validate() and tunneled_jdbc_url() work without it"
        ) from e
    # pragma: no cover — not reachable in this container
    client = paramiko.SSHClient()
    client.set_missing_host_key_policy(paramiko.AutoAddPolicy())  # ssh.go:66-68 parity
    kwargs = {"username": cfg.username, "timeout": 30.0}
    if cfg.password:
        kwargs["password"] = cfg.password
    if cfg.private_key:
        import io

        kwargs["pkey"] = paramiko.RSAKey.from_private_key(
            io.StringIO(cfg.private_key), cfg.passphrase or None
        )
    client.connect(cfg.host, cfg.port, **kwargs)
    local_port = _free_port()
    transport = client.get_transport()
    transport.request_port_forward("127.0.0.1", local_port)
    return client, local_port
