"""Deep corruption soak for every from-scratch codec — the exhaustive
big sibling of tests/test_decode_fuzz.py's sampled property suite.

For each of the 20 stream types the package decodes, this sweeps
EVERY truncation position (not a 60-example sample) and a dense grid
of single-bit flips, asserting the fail-loud contract: each decode
terminates within ALARM_SEC with either well-formed rasters or a clean
Python exception. Run ad hoc (takes minutes, not CI time):

    python scripts/soak_decode_fuzz.py [bitflips_per_fmt]

Exit code 0 = contract held everywhere; any hang or junk-typed output
prints the (fmt, mutation) reproducer and exits 1.
"""

from __future__ import annotations

import signal
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from test_decode_fuzz import _streams  # noqa: E402

from openocr_spark.kernels.media_decode import decode_bytes  # noqa: E402

ALARM_SEC = 20


class Hang(Exception):
    pass


def _alarm(_sig, _frm):
    raise Hang()


def check(fmt: str, data: bytes, what: str) -> str | None:
    """Return an error string if the fail-loud contract broke."""
    signal.alarm(ALARM_SEC)
    try:
        pages = decode_bytes(data)
        for p in pages:
            if not isinstance(p, np.ndarray) or p.dtype != np.uint8:
                return f"{fmt} {what}: junk page type {type(p)}"
            if p.ndim not in (2, 3) or p.size == 0:
                return f"{fmt} {what}: malformed raster shape {p.shape}"
    except Hang:
        return f"{fmt} {what}: HANG (> {ALARM_SEC}s)"
    except Exception:
        return None  # clean exception — the contract's happy path
    finally:
        signal.alarm(0)
    return None


def main() -> int:
    bitflips = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    signal.signal(signal.SIGALRM, _alarm)
    streams = _streams()
    failures: list[str] = []
    for fmt, valid in sorted(streams.items()):
        if only and fmt not in only:
            continue
        n = len(valid)
        fmt_fail_start = len(failures)
        # exhaustive truncation: every prefix length 0..n-1
        for cut in range(n):
            err = check(fmt, valid[:cut], f"trunc@{cut}")
            if err:
                failures.append(err)
                print("FAIL", err, flush=True)
        # dense single-bit flips: exactly `bitflips` flips per format
        # (exhaustive when the stream has no more bits than the budget)
        rng = np.random.RandomState(60606)
        total_bits = n * 8
        bit_idx = (
            np.arange(total_bits)
            if total_bits <= bitflips
            else np.unique(rng.randint(0, total_bits, bitflips))
        )
        for bi in bit_idx:
            off, bit = divmod(int(bi), 8)
            mut = bytearray(valid)
            mut[off] ^= 1 << bit
            err = check(fmt, bytes(mut), f"flip@{off}.{bit}")
            if err:
                failures.append(err)
                print("FAIL", err, flush=True)
        fmt_fails = len(failures) - fmt_fail_start
        print(
            f"[soak] {fmt}: {n} truncations + {len(bit_idx)} bitflips, "
            + ("clean" if fmt_fails == 0 else f"{fmt_fails} FAILURES"),
            flush=True,
        )
    print(f"[soak] done: {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
