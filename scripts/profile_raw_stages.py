"""Stage-by-stage timing of the WINDOWED raw-chunk program on the real
chip (cumulative prefixes; forced execution; salted inputs)."""

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))

import numpy as np

C = 1 << 20


def bench(name, fn, arg, n=3):
    import jax.numpy as jnp

    def force(r):
        leaves = r if isinstance(r, tuple) else (r,)
        acc = 0
        for x in leaves:
            acc = acc + int(jnp.sum(x.astype(jnp.int32)))
        return acc

    force(fn(arg))
    best = float("inf")
    for i in range(n):
        salted = arg + np.uint8(i + 1)
        t0 = time.perf_counter()
        force(fn(salted))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:8.2f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hutoken_tpu.ops.merge import fast_gather
    from hutoken_tpu.ops.split import (
        MAX_WORD, WINDOW, _round_up, _start_mask_any,
    )
    from hutoken_tpu.ops.pallas_merge import _pallas_merge_seg_call
    from hutoken_tpu.engine import TpuTokenizer
    from bench import _load_ctx, build_unique_corpus

    ctx = _load_ctx("small")
    eng = TpuTokenizer(ctx)
    tab = eng._pallas_tab

    docs = build_unique_corpus(1.1)
    blob = ("\n".join(docs)).encode()[:C]
    chunk = np.frombuffer(blob, dtype=np.uint8).copy()
    chunk[chunk >= 0x80] = 97  # keep salting safe (ascii only)

    Rr = _round_up(-(-C // WINDOW), 256)
    Ce = Rr * WINDOW + MAX_WORD
    Tcap = C

    def prefix(upto):
        @jax.jit
        def run(ch):
            n_valid = jnp.int32(C)
            ext = jnp.zeros((Ce - C,), ch.dtype)
            chunk_e = jnp.concatenate([ch, ext])
            iota = lax.iota(jnp.int32, Ce)
            valid = iota < n_valid
            b = chunk_e.astype(jnp.int32)
            kz = jnp.zeros(Ce, jnp.bool_)
            start = _start_mask_any(b, kz, kz, valid)
            if upto == "mask":
                return start
            ws = lax.cummax(jnp.where(start, iota, 0))
            nstart = jnp.where(start, iota, jnp.int32(0x7FFFFFFF))
            ns = jnp.concatenate(
                [lax.cummin(nstart, reverse=True)[1:],
                 jnp.full((1,), 0x7FFFFFFF, jnp.int32)])
            ns = jnp.minimum(ns, n_valid)
            wlen = ns - ws
            long_w = wlen > MAX_WORD
            row = ws // WINDOW
            pos = iota - ws
            gendlane = ws + wlen - 1 - row * WINDOW
            owned = valid & jnp.logical_not(long_w)
            auxval = pos | (gendlane << 5)
            DEADAUX = jnp.int32(1 << 12)
            brow = iota // WINDOW
            auxA = jnp.where(owned & (row == brow), auxval, DEADAUX)
            auxB = jnp.where(owned & (row == brow - 1), auxval, DEADAUX)
            aux128 = jnp.concatenate(
                [auxA[: Rr * WINDOW].reshape(Rr, WINDOW),
                 jnp.concatenate(
                     [auxB[WINDOW: WINDOW + (Rr - 1) * WINDOW].reshape(
                         Rr - 1, WINDOW)[:, :MAX_WORD],
                      jnp.full((1, MAX_WORD), DEADAUX, jnp.int32)])],
                axis=1)
            A = chunk_e[: Rr * WINDOW].reshape(Rr, WINDOW)
            Bv = jnp.concatenate(
                [chunk_e[WINDOW: WINDOW + (Rr - 1) * WINDOW].reshape(
                    Rr - 1, WINDOW)[:, :MAX_WORD],
                 jnp.zeros((1, MAX_WORD), chunk_e.dtype)])
            raw128 = jnp.concatenate([A, Bv], axis=1)
            if upto == "geom":
                return aux128[:, ::17], raw128[:, ::17].astype(jnp.int32)
            out, nxtf = _pallas_merge_seg_call(
                jnp.asarray(tab.tk), jnp.asarray(tab.tv),
                jnp.asarray(tab.tv2), jnp.asarray(tab.lut),
                raw128, aux128,
                depth=tab.depth, rank_in_val=tab.rank_in_val,
                multi_ok=tab.multi_ok, interpret=False)
            if upto == "kernel":
                return out[:, ::17]
            valid_flat = (out >= 0).reshape(-1)
            NL = Rr * 128
            vc = jnp.cumsum(valid_flat.astype(jnp.int32))
            T = vc[NL - 1]
            liota = lax.iota(jnp.int32, NL)
            lkeys = lax.sort(jnp.where(valid_flat, liota, NL))
            src = jnp.minimum(lkeys[:Tcap], NL - 1)
            if upto == "sortc":
                return src[::17]
            tokens = jnp.where(
                lax.iota(jnp.int32, Tcap) < T,
                fast_gather(out.reshape(-1), src), 0
            ).astype(jnp.uint16)
            return tokens

        return run

    for stage in ("mask", "geom", "kernel", "sortc", "full"):
        bench(f"prefix:{stage}", prefix(stage), chunk)


if __name__ == "__main__":
    main()
