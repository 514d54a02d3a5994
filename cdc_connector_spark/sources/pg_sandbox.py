"""Throwaway local PostgreSQL server (initdb + pg_ctl, unix socket, trust
auth) for benching and testing the live database plane without external
infrastructure. Mirrors the server the reference's pipeline writes into —
here it is booted on demand so the COPY DataSource and the live upsert sink
can be measured end-to-end (wall clock includes the real database).

Returns None cleanly when server binaries are unavailable, so callers can
skip rather than fake the live path.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from dataclasses import dataclass

from cdc_connector_spark.sources.pg_copy import PgConn


def _as_pg_user(argv: list[str]) -> list[str]:
    # postgres refuses to run as root; drop to an unprivileged user
    if os.geteuid() == 0:
        return ["runuser", "-u", "postgres", "--"] + argv
    return argv


@dataclass
class LocalPostgres:
    conn: PgConn
    data_dir: str
    _root: str

    def stop(self) -> None:
        subprocess.run(
            _as_pg_user(["pg_ctl", "-D", self.data_dir, "stop", "-m", "immediate"]),
            capture_output=True,
        )
        shutil.rmtree(self._root, ignore_errors=True)


def start_local_postgres(logical: bool = False) -> LocalPostgres | None:
    """Boot a disposable server; returns None if the environment cannot run
    one (missing binaries, no unprivileged user while root, initdb failure).
    ``logical=True`` enables wal_level=logical for replication-slot CDC."""
    if not all(shutil.which(b) for b in ("initdb", "pg_ctl", "postgres", "psql")):
        return None
    # prefer tmpfs for the throwaway cluster: the server is disposable and
    # fsync is off anyway, so disk-backed /tmp only adds I/O variance to
    # bench numbers (the live-plane bench measures the COPY protocol plane,
    # not the sandbox host's disk)
    base = "/dev/shm" if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="pg_sandbox_", dir=base)
    data = os.path.join(root, "data")
    sock = os.path.join(root, "sock")
    os.makedirs(data)
    os.makedirs(sock)
    if os.geteuid() == 0:
        if shutil.which("runuser") is None or subprocess.run(
            ["id", "postgres"], capture_output=True
        ).returncode != 0:
            shutil.rmtree(root, ignore_errors=True)
            return None
        subprocess.run(["chown", "-R", "postgres:postgres", root], check=True)
        subprocess.run(["chmod", "755", root], check=False)
    r = subprocess.run(
        _as_pg_user(["initdb", "-D", data, "-U", "postgres", "--no-sync", "-A", "trust"]),
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        shutil.rmtree(root, ignore_errors=True)
        return None
    # Durability and background-work knobs are all off: the server is
    # disposable, and bench variance from checkpoints / autovacuum /
    # synchronous commits would otherwise drown real regressions
    # (round-4 lesson: +58% upsert_live with zero engine change).
    opts = (
        f"-c listen_addresses='' -c unix_socket_directories={sock}"
        " -c fsync=off -c synchronous_commit=off -c full_page_writes=off"
        " -c autovacuum=off -c checkpoint_timeout=1h -c max_wal_size=8GB"
        " -c shared_buffers=512MB"
    )
    if logical:
        opts += " -c wal_level=logical -c max_replication_slots=4 -c max_wal_senders=4"
    r = subprocess.run(
        _as_pg_user(
            [
                "pg_ctl", "-D", data, "-l", os.path.join(data, "server.log"),
                "-o", opts, "-w", "-t", "60", "start",
            ]
        ),
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        shutil.rmtree(root, ignore_errors=True)
        return None
    return LocalPostgres(conn=PgConn(host=sock), data_dir=data, _root=root)
