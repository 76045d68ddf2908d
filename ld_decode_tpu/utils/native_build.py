"""Per-host cached builds of the native helper libraries.

The .so files are never committed or shared between machines: they are
compiled with ``-march=native``, so a binary built elsewhere can SIGILL
(killing the whole process from inside a ctypes call) or silently run
stale code if checkout mtimes happen to order the wrong way.  Instead
each host compiles into ``~/.cache/ldd_tpu_native/<tag>_<srchash>.so``:
the file name embeds a hash of the source, so a source edit can never
load a stale binary, and concurrent builders race benignly through an
atomic tmp+rename.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess


def cache_dir() -> str:
    d = os.environ.get('LDD_TPU_NATIVE_CACHE')
    if not d:
        d = os.path.join(os.path.expanduser('~'), '.cache',
                         'ldd_tpu_native')
    os.makedirs(d, exist_ok=True)
    return d


def _host_fingerprint() -> bytes:
    """CPU + compiler identity: -march=native binaries must not be
    shared between different machines even through a shared (NFS)
    home-directory cache — a foreign binary can SIGILL from inside a
    ctypes call."""
    import platform
    parts = [platform.machine().encode()]
    try:
        with open('/proc/cpuinfo', 'rb') as f:
            for line in f:
                if line.startswith((b'model name', b'flags')):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        pass
    try:
        parts.append(subprocess.run(['g++', '--version'],
                                    capture_output=True).stdout[:200])
    except OSError:
        pass
    return b'\n'.join(parts)


def build_and_load(src_path: str, tag: str) -> ctypes.CDLL:
    """Compile `src_path` (g++ -O3 -march=native) into the per-host
    cache keyed by the source hash + host/compiler fingerprint and
    dlopen it.  Raises on any compile/load failure (callers catch and
    fall back to numpy)."""
    with open(src_path, 'rb') as f:
        src = f.read()
    h = hashlib.sha256(src + b'\x00' + _host_fingerprint()
                       ).hexdigest()[:16]
    so = os.path.join(cache_dir(), f'{tag}_{h}.so')
    if not os.path.exists(so):
        tmp = f'{so}.tmp.{os.getpid()}'
        subprocess.run(['g++', '-O3', '-march=native', '-shared', '-fPIC',
                        '-o', tmp, src_path],
                       check=True, capture_output=True)
        os.replace(tmp, so)
    return ctypes.CDLL(so)
