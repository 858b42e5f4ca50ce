"""Model-artifact cache (SURVEY S11 tail, VERDICT r2 missing-item 5):
the reference resolves model files through a fixed per-user cache with
a primary→fallback source chain (tools/infer_det.py:36-116 — path
as-given, then ~/.cache/openocr, then ModelScope, then HuggingFace,
copying real bytes rather than symlinks). This is the same semantics
with pluggable LOCAL sources (network fetchers aren't available in
this environment; a production deployment registers its hub clients as
source callables), plus content addressing: every cached artifact is
verified against its sha256 when the caller pins one — a wrong-bytes
cache hit fails loudly instead of silently loading the wrong weights.

Executor shipment: resolve on the DRIVER, then `spark.sparkContext.
addFile(path)` and read via `SparkFiles.get(name)` in kernels — the
same --py-files/addFile mechanism session.package_zip uses for code.
"""

from __future__ import annotations

import hashlib
import os
import uuid
import shutil
from collections.abc import Callable
from pathlib import Path

CACHE_DIR = Path(
    os.environ.get("OPENOCR_ARTIFACT_CACHE", str(Path.home() / ".cache" / "openocr"))
)

# source callables: name -> local path of fetched bytes (raise to skip);
# production registers hub downloads here, tests register tmp dirs
SOURCES: list[tuple[str, Callable[[str], str]]] = []


def register_source(name: str, fetch: Callable[[str], str]) -> None:
    SOURCES.append((name, fetch))


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _verify(path: str, sha256: str | None, origin: str) -> str:
    if sha256 is not None:
        got = sha256_of(path)
        if got != sha256:
            raise RuntimeError(
                f"artifact {path} from {origin} hash mismatch: "
                f"expected {sha256[:12]}…, got {got[:12]}…"
            )
    return str(path)


def resolve_artifact(name: str, sha256: str | None = None) -> str:
    """check_and_download_model semantics: (1) the path as given, (2)
    the cache, (3) each registered source in order — copying the
    fetched file into the cache (copy2, real bytes, never a symlink) —
    else a RuntimeError naming every location tried. When `sha256` is
    pinned, every candidate is verified; a corrupt CACHE entry is
    evicted and the source chain continues (content addressing)."""
    if os.path.exists(name):
        return _verify(name, sha256, "as-given path")
    # strip a relative-path PREFIX only — the reference's lstrip('./')
    # would also eat leading dots of dotted names ('.cache-v2/x' →
    # 'cache-v2/x') and alias distinct names onto one cache entry
    clean = name
    while clean.startswith("./"):
        clean = clean[2:]
    cached = CACHE_DIR / clean
    if cached.exists():
        try:
            return _verify(str(cached), sha256, "cache")
        except RuntimeError:
            cached.unlink()  # evict corrupt entry, fall through to sources
    # names may carry subdirectories (e.g. 'det/model.onnx') — create
    # the full parent chain or every copy-into-cache would fail
    cached.parent.mkdir(parents=True, exist_ok=True)
    errors: list[str] = []
    for src_name, fetch in SOURCES:
        try:
            got = fetch(clean)
            # unique tmp per attempt: a shared '.tmp' would let two
            # concurrent resolvers truncate each other mid-verify and
            # keep writing into the published inode after os.replace
            tmp = f"{cached}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
            try:
                shutil.copy2(got, tmp)
                _verify(tmp, sha256, src_name)
                os.replace(tmp, cached)  # atomic publish into the cache
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            return str(cached)
        except Exception as e:  # noqa: BLE001 — try the next source
            errors.append(f"{src_name}: {e}")
    raise RuntimeError(
        f"artifact {clean!r} not found; tried as-given path, cache "
        f"({cached}), and {len(SOURCES)} source(s): {errors}"
    )


_SHIPPED: dict[str, str] = {}  # basename → resolved path, this driver


def ship_artifact(spark, name: str, sha256: str | None = None) -> str:
    """Resolve on the driver and register with addFile so executors can
    `SparkFiles.get(basename)` it — returns the basename to use there.
    SparkFiles is keyed by BASENAME only, so two different artifacts
    sharing a filename ('det/model.onnx' vs 'rec/model.onnx') would
    silently serve the first one's bytes for both — refuse instead."""
    path = resolve_artifact(name, sha256)
    base = os.path.basename(path)
    prev = _SHIPPED.get(base)
    if prev is not None and prev != path:
        raise ValueError(
            f"artifact basename collision: {base!r} already shipped from "
            f"{prev!r}; rename one artifact — SparkFiles keys by basename"
        )
    spark.sparkContext.addFile(path)
    _SHIPPED[base] = path
    return base
