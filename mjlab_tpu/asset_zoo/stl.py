"""Minimal STL reader for robot visual meshes (no external deps).

Parses binary or ASCII STL into deduplicated (vertices, faces) arrays in
the form mujoco.MjSpec meshes consume (uservert/userface). Used by
spec_builder to attach the asset-zoo visual meshes (reference ships them
as XML file references, reference
src/mjlab/asset_zoo/robots/unitree_g1/xmls/g1.xml:24-59); we embed the
parsed vertex data directly so scene composition (MjSpec.attach) never
depends on meshdir path resolution.
"""

from __future__ import annotations

import functools
import struct
from pathlib import Path

import numpy as np


@functools.lru_cache(maxsize=None)
def load_stl(path: 'str | Path') -> 'tuple[np.ndarray, np.ndarray]':
  """Read an STL file -> (verts (V,3) float32, faces (F,3) int32).

  Vertices are deduplicated exactly (bitwise) so shared corners weld into
  a connected mesh; mujoco recomputes normals itself.
  """
  raw = Path(path).read_bytes()
  tris = _parse_binary(raw) if _is_binary(raw) else _parse_ascii(raw)
  # weld: exact-duplicate corners -> one vertex
  flat = tris.reshape(-1, 3)
  verts, inv = np.unique(flat, axis=0, return_inverse=True)
  faces = inv.reshape(-1, 3).astype(np.int32)
  # drop degenerate triangles (repeated corner after welding)
  ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2]))
  return verts.astype(np.float32), faces[ok]


def _is_binary(raw: bytes) -> bool:
  # ASCII STL starts with 'solid', but some binary files do too: trust
  # the triangle-count arithmetic over the magic word.
  if len(raw) < 84:
    return False
  (ntri,) = struct.unpack_from('<I', raw, 80)
  return len(raw) == 84 + 50 * ntri


def _parse_binary(raw: bytes) -> np.ndarray:
  (ntri,) = struct.unpack_from('<I', raw, 80)
  body = np.frombuffer(raw, dtype=np.uint8, count=50 * ntri, offset=84)
  rec = body.reshape(ntri, 50)
  # 12 bytes normal, 3x12 bytes vertices, 2 bytes attribute
  vals = rec[:, :48].reshape(ntri, 4, 12).copy().view(np.float32)
  return vals[:, 1:4, :3].reshape(ntri, 3, 3)


def _parse_ascii(raw: bytes) -> np.ndarray:
  coords = []
  for line in raw.decode('ascii', errors='replace').splitlines():
    parts = line.split()
    if parts[:1] == ['vertex']:
      coords.append([float(parts[1]), float(parts[2]), float(parts[3])])
  arr = np.asarray(coords, dtype=np.float32)
  if arr.size == 0 or len(arr) % 3:
    raise ValueError('malformed ASCII STL')
  return arr.reshape(-1, 3, 3)
