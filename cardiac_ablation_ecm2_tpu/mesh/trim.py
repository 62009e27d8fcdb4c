"""Mesh trimmer: remove elements by attribute, exposing new boundary.

Reference analog: ``miniapps/meshing/trimmer.cpp`` — the new boundary
elements created at the cut carry attribute ``bdr_max + a`` where ``a`` is
the attribute of the *trimmed* neighbor element (or a user-provided
mapping), so the trimmed-away regions remain identifiable as boundary
conditions."""

from __future__ import annotations

from collections import Counter
from typing import Dict, Optional, Sequence

import numpy as np

from ..fem.geometry import FACES
from .mesh import Mesh


def trim(mesh: Mesh, trim_attrs: Sequence[int],
         bdr_attr_map: Optional[Dict[int, int]] = None) -> Mesh:
    """New mesh with all elements whose attribute is NOT in ``trim_attrs``.

    Interface faces between kept and trimmed elements become boundary
    elements with attribute ``bdr_attr_map[a]`` (default ``bdr_max + a``)
    for trimmed-neighbor attribute ``a``; outer boundary faces of kept
    elements keep their original attributes."""
    trim_set = set(int(a) for a in trim_attrs)
    keep = ~np.isin(mesh.attributes, np.asarray(sorted(trim_set)))
    if keep.all():
        return mesh
    bmax = int(mesh.bdr_attributes.max()) if mesh.nbe else 0
    amap = {a: bmax + a for a in trim_set}
    if bdr_attr_map:
        amap.update({int(k): int(v) for k, v in bdr_attr_map.items()})
    # fallback attribute for kept exterior faces absent from the original
    # boundary list: must not collide with any interface attribute
    # (bmax + 1 collides with amap when a trimmed attribute is 1 —
    # r3 advisor finding)
    untagged = bmax + 1
    while untagged in amap.values():
        untagged += 1

    loc = FACES[mesh.geom]
    # face key -> (count over kept, representative cycle); plus the trimmed
    # neighbor's attribute per face for interface attribution
    faces = Counter()
    rep = {}
    for t in mesh.elements[keep]:
        for f in loc:
            cyc = [int(t[v]) for v in f]
            key = tuple(sorted(cyc))
            faces[key] += 1
            rep.setdefault(key, cyc)
    trimmed_attr = {}
    for t, a in zip(mesh.elements[~keep], mesh.attributes[~keep]):
        for f in loc:
            key = tuple(sorted(int(t[v]) for v in f))
            trimmed_attr[key] = int(a)

    old_bdr = {tuple(sorted(b.tolist())): int(a)
               for b, a in zip(mesh.boundary, mesh.bdr_attributes)}

    bdr, battr = [], []
    for key, c in faces.items():
        if c != 1:
            continue
        bdr.append(rep[key])
        if key in trimmed_attr:                  # cut interface
            battr.append(amap[trimmed_attr[key]])
        else:                                    # original outer boundary
            battr.append(old_bdr.get(key, untagged))

    elems = mesh.elements[keep]
    used = np.unique(elems)
    remap = -np.ones(mesh.nv, dtype=np.int64)
    remap[used] = np.arange(len(used))
    nfv = len(loc[0])
    return Mesh(
        geom=mesh.geom,
        vertices=mesh.vertices[used],
        elements=remap[elems],
        attributes=mesh.attributes[keep],
        boundary=(remap[np.array(bdr, dtype=np.int64)] if bdr else
                  np.zeros((0, nfv), dtype=np.int64)),
        bdr_attributes=np.array(battr, dtype=np.int64),
    )
