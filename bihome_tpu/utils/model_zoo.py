"""Weight cache — the reference's ``cache_url`` without the download.

The reference caches torch-hub URLs under $TORCH_MODEL_ZOO with rank-0-only
download + a barrier (ref: src/utils/model_zoo.py:21-62). This environment
has no egress, so ``resolve_weights`` maps a URL or path to a local file:

  * plain paths pass through,
  * URLs are looked up in the cache dir by basename (pre-seeded by the user),
  * only process 0 would fetch in a networked deployment; every process
    waits on the barrier before reading (same protocol as the reference).
"""

from __future__ import annotations

import os
from typing import Optional
from urllib.parse import urlparse

from bihome_tpu.parallel import dist_util


def default_cache_dir() -> str:
    return os.environ.get(
        'BIHOME_MODEL_ZOO',
        os.path.join(os.path.expanduser('~'), '.cache', 'bihome_tpu'))


def resolve_weights(url_or_path: str,
                    model_dir: Optional[str] = None) -> str:
    """URL/path -> local file path. Raises FileNotFoundError with a clear
    message when a URL's cached copy is absent (no network here)."""
    if not (url_or_path.startswith('http://')
            or url_or_path.startswith('https://')):
        if not os.path.exists(url_or_path):
            raise FileNotFoundError(url_or_path)
        return url_or_path

    model_dir = model_dir or default_cache_dir()
    filename = os.path.basename(urlparse(url_or_path).path)
    cached = os.path.join(model_dir, filename)
    if dist_util.is_main_process() and not os.path.exists(cached):
        raise FileNotFoundError(
            f'{url_or_path} is not cached at {cached} and this environment '
            f'has no network access; place the file there manually '
            f'(reference behavior: rank-0 download, '
            f'ref: src/utils/model_zoo.py:50-58).')
    dist_util.synchronize()
    return cached
