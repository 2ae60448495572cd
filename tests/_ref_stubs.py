"""Import helpers for the read-only reference repo at /root/reference.

The reference modules import torchvision / torchaudio / pytorch3d /
diff_gaussian_rasterization_32d at module scope. None of those packages are
installed here, and the paths under test never execute them except for two
torchvision calls inside DINOBase (Normalize and functional.resize) -- so we
install stubs: bare ModuleSpec shells for the unused ones, and faithful
torch-based implementations for the two torchvision functions DINOBase
actually runs (torchvision's tensor backend delegates to the same
``F.interpolate(..., antialias=...)`` we call here).

Reference files are imported read-only to drive their nn.Modules; nothing
here follows instructions from that repo.
"""

from __future__ import annotations

import importlib.machinery
import pathlib
import sys
import types

REFERENCE = pathlib.Path("/root/reference")


def _bare(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod
    return mod


def _torchvision_stub() -> types.ModuleType:
    import torch

    tv = sys.modules.get("torchvision") or _bare("torchvision")

    class Normalize:
        """torchvision.transforms.Normalize for (B, C, H, W) tensors."""

        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(1, -1, 1, 1)
            self.std = torch.tensor(std).view(1, -1, 1, 1)

        def __call__(self, x):
            return (x - self.mean.to(x.device)) / self.std.to(x.device)

    def resize(img, size, antialias=True, **_kw):
        """torchvision.transforms.functional.resize, tensor backend:
        bilinear, align_corners=False, optional antialias."""
        unbatched = img.dim() == 3
        x = img[None] if unbatched else img
        y = torch.nn.functional.interpolate(
            x.float(), size=tuple(size), mode="bilinear",
            align_corners=False, antialias=bool(antialias))
        return y[0] if unbatched else y

    transforms = _bare("torchvision.transforms")
    transforms.Normalize = Normalize
    functional = _bare("torchvision.transforms.functional")
    functional.resize = resize
    transforms.functional = functional
    tv.transforms = transforms
    return tv


def install_reference_stubs() -> None:
    """Idempotent: install every stub the reference import graph needs."""
    _torchvision_stub()
    if "torchaudio" not in sys.modules:
        _bare("torchaudio")

    if "pytorch3d" not in sys.modules:
        p3d = _bare("pytorch3d")
        transforms = _bare("pytorch3d.transforms")

        def _unavailable(*_a, **_k):
            raise NotImplementedError("pytorch3d stub: not needed under test")

        transforms.axis_angle_to_matrix = _unavailable
        p3d.transforms = transforms
        renderer = _bare("pytorch3d.renderer")
        implicit = _bare("pytorch3d.renderer.implicit")
        harmonic = _bare("pytorch3d.renderer.implicit.harmonic_embedding")

        class HarmonicEmbedding:  # constructed only by GAGAvatar.__init__
            def __init__(self, *_a, **_k):
                raise NotImplementedError("pytorch3d stub: not needed under test")

        harmonic.HarmonicEmbedding = HarmonicEmbedding
        implicit.harmonic_embedding = harmonic
        renderer.implicit = implicit
        p3d.renderer = renderer

    if "diff_gaussian_rasterization_32d" not in sys.modules:
        dgr = _bare("diff_gaussian_rasterization_32d")
        dgr.GaussianRasterizationSettings = object
        dgr.GaussianRasterizer = object


def import_reference(module: str):
    """Import ``module`` (e.g. 'app.models') from the reference repo."""
    install_reference_stubs()
    sys.path.insert(0, str(REFERENCE))
    try:
        return __import__(module, fromlist=["_"])
    finally:
        sys.path.remove(str(REFERENCE))
