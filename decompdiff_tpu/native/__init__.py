"""ctypes bindings for the native host runtime (libddnative.so).

Compiled on first import with g++ (cached beside the source); every entry
point has a pure-python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'ddnative.cpp')
_SO = os.path.join(_DIR, 'libddnative.so')
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', _SRC, '-o', _SO + '.tmp'],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + '.tmp', _SO)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        cp = ctypes.c_char_p

        lib.pad_f32.argtypes = [f32p, i64p, ctypes.c_int64, ctypes.c_int64,
                                ctypes.c_int64, f32p]
        lib.pad_i32.argtypes = [i32p, i64p, ctypes.c_int64, ctypes.c_int64,
                                ctypes.c_int64, i32p]
        lib.length_mask.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.pad_square_i32.argtypes = [i32p, i64p, ctypes.c_int64,
                                       ctypes.c_int64, i32p]
        lib.bond_mask.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.parse_pdb_atoms.restype = ctypes.c_int64
        lib.parse_pdb_atoms.argtypes = [
            cp, ctypes.c_int64, ctypes.c_int64, i32p, f32p, i32p,
            cp, cp, cp, cp, cp, cp, i64p, i32p]
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.perceive_bonds.restype = ctypes.c_int64
        lib.perceive_bonds.argtypes = [
            f64p, f64p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, i32p, i32p]
        _lib = lib
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def available() -> bool:
    return get_lib() is not None


# --- high-level wrappers ------------------------------------------------------

def _check_counts(counts, n_pad: int, fn: str):
    """The C entry points memcpy with no bounds checks — an oversize count
    would be silent heap corruption (or a size_t-underflow memset), so the
    wrappers validate loudly for native AND fallback parity."""
    if len(counts) and int(np.max(counts)) > n_pad:
        raise ValueError(
            f'{fn}: max count {int(np.max(counts))} exceeds n_pad {n_pad}')


def pad_stack_f32(arrays, n_pad: int) -> np.ndarray:
    """[(n_i, F)] float32 -> [B, n_pad, F]. Native memcpy path."""
    lib = get_lib()
    B = len(arrays)
    F = arrays[0].shape[-1] if arrays[0].ndim > 1 else 1
    counts = np.array([len(a) for a in arrays], np.int64)
    _check_counts(counts, n_pad, 'pad_stack_f32')
    out = np.zeros((B, n_pad, F), np.float32)
    if lib is None:
        for b, a in enumerate(arrays):
            out[b, :len(a)] = a.reshape(len(a), F)
        return out
    src = np.ascontiguousarray(
        np.concatenate([a.reshape(-1, F) for a in arrays], 0), np.float32)
    lib.pad_f32(_ptr(src, ctypes.c_float), _ptr(counts, ctypes.c_int64),
                B, n_pad, F, _ptr(out, ctypes.c_float))
    return out


def pad_stack_i32(arrays, n_pad: int) -> np.ndarray:
    lib = get_lib()
    B = len(arrays)
    F = arrays[0].shape[-1] if arrays[0].ndim > 1 else 1
    counts = np.array([len(a) for a in arrays], np.int64)
    _check_counts(counts, n_pad, 'pad_stack_i32')
    out = np.zeros((B, n_pad, F), np.int32)
    if lib is None:
        for b, a in enumerate(arrays):
            out[b, :len(a)] = a.reshape(len(a), F)
        return out
    src = np.ascontiguousarray(
        np.concatenate([a.reshape(-1, F) for a in arrays], 0), np.int32)
    lib.pad_i32(_ptr(src, ctypes.c_int32), _ptr(counts, ctypes.c_int64),
                B, n_pad, F, _ptr(out, ctypes.c_int32))
    return out


def length_masks(counts, n_pad: int) -> np.ndarray:
    lib = get_lib()
    counts = np.asarray(counts, np.int64)
    _check_counts(counts, n_pad, 'length_masks')
    B = len(counts)
    out = np.zeros((B, n_pad), np.uint8)
    if lib is None:
        for b, n in enumerate(counts):
            out[b, :n] = 1
        return out.astype(bool)
    lib.length_mask(_ptr(counts, ctypes.c_int64), B, n_pad,
                    _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def pad_square_stack_i32(mats, n_pad: int) -> np.ndarray:
    lib = get_lib()
    B = len(mats)
    counts = np.array([m.shape[0] for m in mats], np.int64)
    _check_counts(counts, n_pad, 'pad_square_stack_i32')
    out = np.zeros((B, n_pad, n_pad), np.int32)
    if lib is None:
        for b, m in enumerate(mats):
            out[b, :len(m), :len(m)] = m
        return out
    src = np.ascontiguousarray(
        np.concatenate([np.asarray(m, np.int32).reshape(-1) for m in mats]))
    lib.pad_square_i32(_ptr(src, ctypes.c_int32),
                       _ptr(counts, ctypes.c_int64), B, n_pad,
                       _ptr(out, ctypes.c_int32))
    return out


def fc_bond_masks(counts, n_pad: int) -> np.ndarray:
    lib = get_lib()
    counts = np.asarray(counts, np.int64)
    _check_counts(counts, n_pad, 'fc_bond_masks')
    B = len(counts)
    out = np.zeros((B, n_pad, n_pad), np.uint8)
    if lib is None:
        for b, n in enumerate(counts):
            out[b, :n, :n] = 1
            np.fill_diagonal(out[b], 0)
        return out.astype(bool)
    lib.bond_mask(_ptr(counts, ctypes.c_int64), B, n_pad,
                  _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def parse_pdb_atoms_native(text: str, max_atoms: int = 100000):
    """Fast ATOM-record parse; returns dict of arrays or None when the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    serial = np.zeros(max_atoms, np.int32)
    pos = np.zeros((max_atoms, 3), np.float32)
    res_id = np.zeros(max_atoms, np.int32)
    atom_name = ctypes.create_string_buffer(max_atoms * 4)
    res_name = ctypes.create_string_buffer(max_atoms * 3)
    chain = ctypes.create_string_buffer(max_atoms)
    insert_id = ctypes.create_string_buffer(max_atoms)
    element = ctypes.create_string_buffer(max_atoms * 2)
    segment = ctypes.create_string_buffer(max_atoms * 4)
    line_off = np.zeros(max_atoms, np.int64)
    line_len = np.zeros(max_atoms, np.int32)
    n = lib.parse_pdb_atoms(raw, len(raw), max_atoms,
                            _ptr(serial, ctypes.c_int32),
                            _ptr(pos, ctypes.c_float),
                            _ptr(res_id, ctypes.c_int32),
                            atom_name, res_name, chain, insert_id, element,
                            segment, _ptr(line_off, ctypes.c_int64),
                            _ptr(line_len, ctypes.c_int32))
    if n < 0:
        return None
    n = int(n)
    names = [atom_name.raw[i * 4:(i + 1) * 4].decode().strip()
             for i in range(n)]
    resnames = [res_name.raw[i * 3:(i + 1) * 3].decode().strip()
                for i in range(n)]
    elements = [element.raw[i * 2:(i + 1) * 2].decode().strip().capitalize()
                or names[i][:1] for i in range(n)]
    return {
        'serial': serial[:n].copy(), 'pos': pos[:n].copy(),
        'res_id': res_id[:n].copy(), 'atom_name': names,
        'res_name': resnames,
        'chain': [chain.raw[i:i + 1].decode() for i in range(n)],
        'insert_id': [insert_id.raw[i:i + 1].decode() for i in range(n)],
        'element': elements,
        'segment': [segment.raw[i * 4:(i + 1) * 4].decode().strip()
                    for i in range(n)],
        # byte offsets/lengths of each ATOM line in the source text (PDB is
        # ASCII, so byte == str indices for the caller's slicing)
        'line_off': line_off[:n].copy(), 'line_len': line_len[:n].copy(),
    }


def perceive_bonds_native(pos: np.ndarray, radii: np.ndarray,
                          stretch: float = 1.3, min_d: float = 0.4):
    lib = get_lib()
    if lib is None:
        return None
    # float64 end-to-end: matches the numpy fallback at cutoff boundaries
    pos = np.ascontiguousarray(pos, np.float64)
    radii = np.ascontiguousarray(radii, np.float64)
    n = len(pos)
    max_bonds = n * 16 + 16
    src = np.zeros(max_bonds, np.int32)
    dst = np.zeros(max_bonds, np.int32)
    m = lib.perceive_bonds(_ptr(pos, ctypes.c_double),
                           _ptr(radii, ctypes.c_double), n,
                           stretch, min_d, max_bonds,
                           _ptr(src, ctypes.c_int32),
                           _ptr(dst, ctypes.c_int32))
    if m < 0:
        return None
    return src[:int(m)].copy(), dst[:int(m)].copy()
