"""Device/host transfer helpers.

Measured on the axon-tunneled TPU v5e (scripts/drive_tunnel_semantics.py):
  * D2H transfers fire as soon as their source value is ready — they are
    NOT ordered behind later-dispatched programs;
  * ``copy_to_host_async()`` issued at dispatch time makes a later blocking
    ``device_get`` ~0.2 ms instead of a full ~30 ms tunnel round-trip (the
    transfer command is already server-side when the value materializes,
    and the response rides back while the host does other work);
  * per-program dispatch overhead is negligible (~0.07 ms).

So every pending device result whose scalars the host will eventually pull
should be prefetched at dispatch time.
"""
from __future__ import annotations


def prefetch_to_host(*arrays) -> None:
    """Start a non-blocking D2H copy of each array (best effort)."""
    for a in arrays:
        if a is None:
            continue
        try:
            a.copy_to_host_async()
        except (AttributeError, NotImplementedError, RuntimeError):
            return
