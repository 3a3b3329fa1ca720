"""Serving sandbox: chroot + setuid privilege drop.

Rebuild of the reference's rest.MakeSandbox (reference:
internal/rest/sandbox_unix.go:32-47): when serving HTTP as root, chroot into
the working directory and drop to an unprivileged uid. No-ops with warnings
when not configured or unsupported.
"""

from __future__ import annotations

import os
import sys


def make_sandbox(chroot_dir: str, setuid: int, log=None) -> None:
    log = log or sys.stdout
    if chroot_dir:
        try:
            os.chroot(chroot_dir)
            os.chdir("/")
            print(f"chrooted into {chroot_dir}", file=log)
        except (OSError, AttributeError) as e:
            print(f"Warning: unable to chroot to {chroot_dir}: {e}", file=log)
    if setuid >= 0:
        try:
            os.setuid(setuid)
            print(f"setuid to {setuid}", file=log)
        except (OSError, AttributeError) as e:
            print(f"Warning: unable to setuid to {setuid}: {e}", file=log)
