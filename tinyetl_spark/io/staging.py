"""Transport protocols that stage a remote file locally, then hand off
to the file connectors — the reference's protocol layer
(src/protocols/http.rs:23-171, src/protocols/ssh.rs:23-96).

* http(s): GET → temp file; supports ``header.*`` options, basic auth
  and bearer token, then dispatches on extension or explicit type.
* ssh: shells out to ``scp`` exactly like the reference (ssh.rs:70-83).

Staging happens on the DRIVER — same as the reference (single binary).
At cluster scale you would point spark.read at the object store
directly instead; this path exists for reference-parity workflows.
"""

from __future__ import annotations

import base64
import os
import subprocess
import tempfile
import urllib.request
from urllib.parse import urlparse


def http_fetch(url: str, options: dict[str, str] | None = None) -> str:
    """Download to a temp file; returns the staged path."""
    options = options or {}
    req = urllib.request.Request(url.split("#")[0])
    for k, v in options.items():
        if k.startswith("header."):
            req.add_header(k[len("header."):], v)
    # reference option names (http.rs:54-62): auth.basic.username /
    # auth.basic.password and auth.bearer; the flat basic_auth
    # ("user:pass") / bearer_token forms stay accepted as aliases
    if "auth.basic.username" in options or "auth.basic.password" in options:
        pair = (
            options.get("auth.basic.username", "")
            + ":"
            + options.get("auth.basic.password", "")
        )
        token = base64.b64encode(pair.encode()).decode()
        req.add_header("Authorization", f"Basic {token}")
    elif "basic_auth" in options:  # "user:pass"
        token = base64.b64encode(options["basic_auth"].encode()).decode()
        req.add_header("Authorization", f"Basic {token}")
    if "auth.bearer" in options:
        req.add_header("Authorization", f"Bearer {options['auth.bearer']}")
    elif "bearer_token" in options:
        req.add_header("Authorization", f"Bearer {options['bearer_token']}")
    suffix = os.path.splitext(urlparse(url).path)[1] or ".dat"
    fd, staged = tempfile.mkstemp(prefix="tinyetl_http_", suffix=suffix)
    with os.fdopen(fd, "wb") as out, urllib.request.urlopen(req) as resp:  # noqa: S310
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return staged


def ssh_fetch(url: str, options: dict[str, str] | None = None) -> str:
    """scp the remote path to a temp file (reference ssh.rs:70-83:
    ``scp -P port user@host:path tmp`` with StrictHostKeyChecking=no)."""
    parsed = urlparse(url.split("#")[0])
    host = parsed.hostname or ""
    user = parsed.username
    port = parsed.port or 22
    remote_path = parsed.path
    target = f"{user}@{host}:{remote_path}" if user else f"{host}:{remote_path}"
    suffix = os.path.splitext(remote_path)[1] or ".dat"
    fd, staged = tempfile.mkstemp(prefix="tinyetl_ssh_", suffix=suffix)
    os.close(fd)
    cmd = [
        "scp", "-P", str(port), "-o", "StrictHostKeyChecking=no",
        "-o", "BatchMode=yes", target, staged,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(f"scp failed ({proc.returncode}): {proc.stderr.strip()}")
    return staged
