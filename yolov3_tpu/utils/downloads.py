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


def download(urls, dir=".", unzip=True, delete=True, curl=False, threads=1, retry=3):
    """Fetch one or more URLs into `dir`, optionally extracting archives.

    Counterpart of reference utils/general.py:490-534 `download()`: per-URL
    retry loop with curl fallback, multithreaded when threads > 1, and
    zip/tar/tar.gz extraction into the download directory. Extraction uses
    the stdlib zipfile/tarfile modules (with a path-traversal filter) instead
    of shelling out to tar.
    """
    import shutil
    import tarfile
    import zipfile
    from concurrent.futures import ThreadPoolExecutor

    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)

    def one(url):
        local = Path(str(url)).is_file()
        if local:
            f = Path(str(url))  # pre-existing local file: extract-only, keep it
        else:
            f = dir / Path(str(url)).name
            for i in range(retry + 1):
                try:
                    if curl:
                        subprocess.run(
                            ["curl", "-L", str(url), "-o", str(f), "--retry", "2", "-C", "-"],
                            check=True, capture_output=threads > 1)
                    else:
                        LOGGER.info(f"Downloading {url} to {f}...")
                        # urlretrieve has no timeout — a filtered network
                        # would hang the preparer forever; stream with one.
                        import shutil as _sh

                        with urllib.request.urlopen(str(url), timeout=30) as r, open(f, "wb") as out:
                            _sh.copyfileobj(r, out)
                    assert f.is_file() and f.stat().st_size > 0
                    break
                except Exception as e:  # noqa: BLE001
                    if f.exists():
                        f.unlink()
                    if i >= retry:
                        LOGGER.warning(f"Failed to download {url}: {e}")
                        return
                    LOGGER.warning(f"Download failure, retrying {i + 1}/{retry} {url}...")
        if unzip and f.is_file() and f.suffix in (".zip", ".tar", ".gz", ".tgz"):
            LOGGER.info(f"Unzipping {f}...")
            if zipfile.is_zipfile(f):
                with zipfile.ZipFile(f) as z:
                    z.extractall(dir)
            elif tarfile.is_tarfile(f):
                with tarfile.open(f) as t:
                    t.extractall(dir, filter="data")
            elif f.suffix == ".gz":
                import gzip

                with gzip.open(f, "rb") as src, open(f.with_suffix(""), "wb") as dst:
                    shutil.copyfileobj(src, dst)
            if delete and not local:
                f.unlink()

    urls = [urls] if isinstance(urls, (str, Path)) else list(urls)
    if threads > 1:
        with ThreadPoolExecutor(threads) as pool:
            list(pool.map(one, urls))
    else:
        for u in urls:
            one(u)


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
