"""Build the native kernels on demand.

The reference ships its hot loops as compiled C++ (Makefile targets,
SURVEY.md §2 "Build system"); here the native kernels live in native/
and are loaded via ctypes from bin/.  A fresh checkout has no bin/
artifacts, so the ctypes loaders call ensure_built() to run
`make -C native` once (guarded by an exclusive lock so a fork pool of
workers does not race the compiler).  Set UVC_TPU_NO_NATIVE_BUILD=1 to
skip and use the pure-python reference paths.
"""

import os
import subprocess
import sys

_ATTEMPTED = False

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_TARGETS = ("rowpile.so", "bamdec.so")


def _up_to_date():
    try:
        newest_src = max(
            os.path.getmtime(os.path.join(_REPO, "native", f))
            for f in os.listdir(os.path.join(_REPO, "native"))
            if f.endswith((".cpp", ".hpp")))
    except (OSError, ValueError):
        return True  # no sources: nothing to build
    for t in _TARGETS:
        p = os.path.join(_REPO, "bin", t)
        if not os.path.exists(p) or os.path.getmtime(p) < newest_src:
            return False
    return True


def ensure_built():
    """Run `make -C native` if bin/ artifacts are missing/stale.

    Returns True when the targets exist afterwards.  Never raises: a
    failed build just leaves the python fallbacks in charge.
    """
    global _ATTEMPTED
    if _up_to_date():
        return True
    if _ATTEMPTED or os.environ.get("UVC_TPU_NO_NATIVE_BUILD"):
        return _up_to_date()
    _ATTEMPTED = True
    lock_path = os.path.join(_REPO, "native", ".build.lock")
    try:
        lock_fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    except OSError:
        return False
    try:
        import fcntl
        fcntl.flock(lock_fd, fcntl.LOCK_EX)  # serialize across workers
        if _up_to_date():  # someone else built it while we waited
            return True
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "native")],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            timeout=600, check=False)
    except Exception as e:  # missing make/g++, timeout, ...
        print(f"uvc_tpu: native build skipped ({e}); "
              "using python fallbacks", file=sys.stderr)
    finally:
        os.close(lock_fd)
    return _up_to_date()
