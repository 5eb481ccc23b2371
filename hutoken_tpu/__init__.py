"""hutoken-tpu: a TPU-native BPE tokenization framework.

Public API parity with the reference ``hutoken`` facade (reference:
hutoken.py): ``initialize``, ``encode``, ``batch_encode``, ``decode``,
``batch_decode``, ``bpe_train``, ``bbpe_train``, ``initialize_foma``,
``look_up_word`` as module-level functions operating on a process-global
tokenizer, plus the Hugging Face import path.

Beyond parity, the same machinery is available object-style via
:class:`hutoken_tpu.engine.TpuTokenizer` (sharded, batched, jit-compiled),
which is what the module facade drives underneath.

Backend selection (env ``HUTOKEN_TPU_BACKEND`` or ``backend=`` kwarg of
``initialize``):

* ``device`` — pre-tokenize/pack on host, BPE merge fixed-point on the
  TPU (default when JAX has a non-CPU device or for batch calls),
* ``host``   — pure host scalar path (the exact oracle / C++ engine),
* ``auto``   — device for batch workloads, host for short single calls.
"""

from __future__ import annotations

import os
import sys
import traceback
from typing import Any, Optional

from . import oracle
from .bytemaps import SPECIAL_CHAR_BYTES as _SPECIAL_CHARS  # parity re-export
from .context import TokenizerContext
from .utils.logging import initialize_logging, log_debug

__version__ = "0.1.0"

_ctx: Optional[TokenizerContext] = None
_engine = None  # lazily-built device engine bound to _ctx
_backend = "auto"

_ENCODE_UNINIT_MSG = (
    "Vocabulary is not initialized for encoding. "
    "Call 'initialize_encode' function first."
)
_DECODE_UNINIT_MSG = (
    "Vocabulary is not initialized for decoding. "
    "Call 'initialize_decode' function first."
)


def _reset() -> None:
    global _ctx, _engine, _native, _native_failed
    _ctx = None
    _engine = None
    _native = None
    _native_failed = False


def initialize(model_or_path: str, *args: Any, **kwargs: Any):
    """Initialize the global tokenizer from a vocab file path or a Hugging
    Face model id (reference: hutoken.py:22-120).

    File branch: ``initialize(vocab_file, special_chars_file, prefix=...,
    is_byte_encoder=..., token_id=..., pattern=...)`` — the special-chars
    file may be passed as the first positional arg.  As an extension over
    the reference facade (which drops it, hutoken.py:42), a
    ``merges_file_path=`` kwarg is honored in the file branch too.
    """
    global _ctx, _engine, _backend
    initialize_logging()
    from .utils.mem import tune_allocator

    tune_allocator()
    _backend = kwargs.pop("backend", os.environ.get("HUTOKEN_TPU_BACKEND", "auto"))

    if os.path.isfile(model_or_path):
        # the reference binding parses a fixed keyword list and CPython
        # raises TypeError for anything else (src/lib.c:188-205); a
        # silently-dropped misspelling (e.g. special_file_path=) would
        # otherwise produce wrong ids with no signal
        unknown = set(kwargs) - {
            "prefix", "is_byte_encoder", "token_id", "pattern",
            "merges_file_path",
        }
        if unknown:
            raise TypeError(
                f"'{sorted(unknown)[0]}' is an invalid keyword argument "
                "for initialize()"
            )
        special_chars_file = args[0] if args else None
        merges_file = kwargs.get("merges_file_path", None)
        if len(args) > 6 and merges_file is None:
            merges_file = args[6]
        if special_chars_file and not os.path.isfile(special_chars_file):
            raise ValueError(
                f"Special characters file '{special_chars_file}' does not exist."
            )
        if merges_file and not os.path.isfile(merges_file):
            raise ValueError(
                f"The provided merges file '{merges_file}' does not exist."
            )

        prefix = kwargs.get("prefix", None)
        is_byte_encoder = kwargs.get("is_byte_encoder", False)
        kwargs.get("token_id", -1)  # parsed but unused, like the reference
        regex_pattern = kwargs.get("pattern", None)

        _reset()
        _ctx = TokenizerContext.load(
            model_or_path,
            special_chars_file,
            prefix=prefix,
            is_byte_encoder=is_byte_encoder,
            pattern=regex_pattern,
            merges_file_path=merges_file,
        )
        return None

    from .hf_import import import_hf_tokenizer  # deferred: optional dep

    vocab_file, special_chars_file, prefix, is_byte_encoder, merges_file_path = (
        import_hf_tokenizer(model_or_path)
    )
    try:
        _reset()
        _ctx = TokenizerContext.load(
            vocab_file,
            special_chars_file,
            prefix=prefix,
            is_byte_encoder=is_byte_encoder,
            pattern=kwargs.get("pattern", None),
            merges_file_path=merges_file_path,
        )
    except Exception as e:  # reference: hutoken.py:113-118
        traceback.print_exc(file=sys.stderr)
        raise RuntimeError(
            f"An unexpected error occured during initialization: {e}"
        ) from e
    return None


def _get_engine():
    """Build (lazily) the device engine for the current context."""
    global _engine
    if _engine is None:
        from .engine import TpuTokenizer

        _engine = TpuTokenizer(_ctx, prefer_device_decode=(_backend == "device"))
    return _engine


_native = None
_native_failed = False


def _get_native():
    """Build (lazily) the native C++ host engine; None if unavailable."""
    global _native, _native_failed
    if _native is None and not _native_failed:
        try:
            from .native import NativeEngine

            _native = NativeEngine(_ctx)
        except Exception as e:
            log_debug("native host engine unavailable: %s", e)
            _native_failed = True
    return _native


def _use_device(batch: bool) -> bool:
    if _backend == "host":
        return False
    if _backend == "device":
        return True
    if not batch:
        return False
    # auto: device for batch workloads when the engine can come up;
    # otherwise fall back to the host path rather than failing.
    try:
        _get_engine()
        return True
    except Exception as e:  # e.g. no JAX device in this environment
        log_debug("device engine unavailable, using host path: %s", e)
        return False


def encode(text: str) -> list[int]:
    """Encode one document (reference: hutoken.py:122-130)."""
    if _ctx is None:
        raise RuntimeError(f"hutoken: Error encoding text: {_ENCODE_UNINIT_MSG}")
    try:
        if _use_device(batch=False):
            return _get_engine().encode_batch([text])[0]
        native = _get_native()
        if native is not None and native.supports_pattern:
            return native.encode_batch([text], 1)[0]
        return oracle.encode(_ctx, text)
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        raise RuntimeError(f"hutoken: Error encoding text: {e}") from e


def batch_encode(texts: list[str], num_threads: int = 1) -> list[list[int]]:
    """Encode a batch of documents (reference: hutoken.py:132-139).

    ``num_threads`` is accepted for API parity; parallelism on TPU comes
    from batch vectorization and the device mesh, not host threads
    (reference equivalent: src/taskqueue.c + src/lib.c:722-874).
    """
    if _ctx is None:
        raise RuntimeError(f"hutoken: Error encoding texts: {_ENCODE_UNINIT_MSG}")
    try:
        if _use_device(batch=True):
            return _get_engine().encode_batch(texts)
        native = _get_native()
        if native is not None and native.supports_pattern:
            return native.encode_batch(texts, num_threads)
        return [oracle.encode(_ctx, t) for t in texts]
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        raise RuntimeError(f"hutoken: Error encoding texts: {e}") from e


def decode(tokens: list[int]) -> str:
    """Decode one token list (reference: hutoken.py:141-152)."""
    if _ctx is None:
        raise RuntimeError(f"hutoken: Error decoding tokens: {_DECODE_UNINIT_MSG}")
    try:
        if _use_device(batch=False):
            return _get_engine().decode_batch([list(tokens)])[0]
        native = _get_native()
        if native is not None:
            return native.decode_batch([list(tokens)], 1)[0]
        return oracle.decode(_ctx, list(tokens))
    except ValueError as e:
        traceback.print_exc(file=sys.stderr)
        raise ValueError(f"hutoken: Error decoding tokens {tokens}: {e}") from e
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        raise RuntimeError(f"hutoken: Error decoding tokens: {e}") from e


def batch_decode(tokens: list[list[int]], num_threads: int = 1) -> list[str]:
    """Decode a batch (reference: hutoken.py:154-161)."""
    if _ctx is None:
        raise RuntimeError(f"hutoken: Error decoding tokens: {_DECODE_UNINIT_MSG}")
    try:
        if len(tokens) <= 0:
            # reference: src/lib.c:977-980
            raise ValueError("No tokens provided.")
        if _use_device(batch=True):
            return _get_engine().decode_batch(
                [list(t) for t in tokens], num_threads=num_threads
            )
        native = _get_native()
        if native is not None:
            return native.decode_batch([list(t) for t in tokens], num_threads)
        return [oracle.decode(_ctx, list(t)) for t in tokens]
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        raise RuntimeError(f"hutoken: Error decoding tokens: {e}") from e


def bpe_train(data: str, vocab_size: int, vocab_file_name: str, **kwargs: Any):
    """Train a BPE vocab (reference: hutoken.py:163-166, src/lib.c:76-100).

    Extra kwargs (extensions): ``mesh`` for sharded pair counting,
    ``strict=False`` to disable reference-bug emulation (see train.bpe).
    """
    from .train.bpe import bpe_train as _bpe_train

    _validate_train_args(vocab_size, vocab_file_name)
    return _bpe_train(data, vocab_size, vocab_file_name, **kwargs)


def bbpe_train(data: str, vocab_size: int, vocab_file_name: str, **kwargs: Any):
    """Train a byte-level BPE vocab (reference: hutoken.py:168-171, src/lib.c:102-126)."""
    from .train.bbpe import bbpe_train as _bbpe_train

    _validate_train_args(vocab_size, vocab_file_name)
    return _bbpe_train(data, vocab_size, vocab_file_name, **kwargs)


def _validate_train_args(vocab_size: int, vocab_file_name: str) -> None:
    # reference: src/lib.c:85-95
    if vocab_size < 256:
        raise RuntimeError("vocab_size must be at least 256 to encode all bytes.")
    if len(vocab_file_name) < 4 or not vocab_file_name.endswith(".txt"):
        raise RuntimeError("vocab_file_name file extension must be .txt.")


def initialize_foma():
    """Load the foma/emMorph FST (reference: hutoken.py:173-181, src/core.c:585-606)."""
    from . import morphology

    if not morphology.available():
        raise RuntimeError(
            "hutoken: '_hutoken' does not provide 'initialize_foma' "
            "or Foma support is not installed."
        )
    return morphology.initialize_foma()


def look_up_word(handle, word: str, only_longest: bool = False):
    """Morphological analysis of a word (reference: hutoken.py:183-191, src/core.c:608-696)."""
    from . import morphology

    if not morphology.available():
        raise RuntimeError(
            "hutoken: '_hutoken' does not provide 'look_up_word' "
            "or Foma support is not installed."
        )
    return morphology.look_up_word(handle, word, only_longest)
