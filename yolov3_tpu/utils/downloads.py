"""Download helpers — reference utils/downloads.py counterpart.

`attempt_download` resolves missing weight files from a release URL with
retry + curl fallback. In zero-egress environments every network call fails
soft with a clear message (the reference auto-downloads from GitHub releases,
downloads.py:82-128).
"""

from __future__ import annotations

import subprocess
import urllib.request
from pathlib import Path

from yolov3_tpu.utils.general import LOGGER

RELEASE_URL = "https://github.com/ultralytics/yolov3/releases/download/v9.6.0"


def safe_download(file, url, url2=None, min_bytes=1e0, error_msg=""):
    """Download `url` to `file`; fall back to curl / url2; validate min size."""
    file = Path(file)
    try:
        LOGGER.info(f"Downloading {url} to {file}...")
        urllib.request.urlretrieve(url, file)
        assert file.exists() and file.stat().st_size > min_bytes
    except Exception as e:  # noqa: BLE001
        if file.exists():
            file.unlink()
        LOGGER.warning(f"Download failure ({e}), retrying with curl {url2 or url}")
        try:
            subprocess.run(["curl", "-L", url2 or url, "-o", str(file), "--retry", "3", "-C", "-"], check=True)
        except Exception as e2:  # noqa: BLE001
            if file.exists():
                file.unlink()
            raise FileNotFoundError(f"{error_msg or url} download failed: {e2}") from e2
    if not (file.exists() and file.stat().st_size > min_bytes):
        raise FileNotFoundError(error_msg or f"{url} produced an empty file")
    return file


def attempt_download(file, repo_url=RELEASE_URL):
    """Return the path to `file`, downloading the reference release asset if missing."""
    file = Path(str(file).strip().replace("'", ""))
    if file.exists():
        return str(file)
    name = file.name
    if name.endswith(".pt"):
        url = f"{repo_url}/{name}"
        file.parent.mkdir(parents=True, exist_ok=True)
        return str(safe_download(file, url, min_bytes=1e5, error_msg=f"{name} not found locally and"))
    raise FileNotFoundError(f"{file} does not exist")
