"""Visualization utilities (matplotlib; cartopy optional).

Equivalent of the reference utils.py:77-935 plotting stack
(``plot_recreated_vs_original``, trajectory animations/static panels,
jet-RGB conversion). Cartopy map projections are used when the library is
present; otherwise plain lat/lon pcolormesh panels are drawn, so the
functions work in the minimal TPU image.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _get_axes(n, figsize):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    try:
        import cartopy.crs as ccrs
        fig, axes = plt.subplots(
            1, n, figsize=figsize,
            subplot_kw={"projection": ccrs.Robinson()})
        proj = True
    except ImportError:
        fig, axes = plt.subplots(1, n, figsize=figsize)
        proj = False
    if n == 1:
        axes = [axes]
    return fig, list(np.atleast_1d(axes)), proj


def _draw(ax, field, lat, lon, proj, cmap="jet", vmin=None, vmax=None):
    if proj:
        import cartopy.crs as ccrs
        im = ax.pcolormesh(lon, lat, field, cmap=cmap, vmin=vmin, vmax=vmax,
                           transform=ccrs.PlateCarree())
        ax.coastlines(linewidth=0.4)
    else:
        im = ax.pcolormesh(lon, lat, field, cmap=cmap, vmin=vmin, vmax=vmax)
    return im


def plot_reconstruction_comparison(
    original: np.ndarray,       # (lat, lon)
    reconstructed: np.ndarray,  # (lat, lon)
    lat: np.ndarray,
    lon: np.ndarray,
    title: str = "",
    out_path: Optional[str] = None,
):
    """3-panel original / reconstruction / error figure
    (reference utils.py:108-215)."""
    import matplotlib.pyplot as plt

    fig, axes, proj = _get_axes(3, (15, 4))
    vmin, vmax = np.nanmin(original), np.nanmax(original)
    for ax, (f, name) in zip(axes, [
            (original, "original"), (reconstructed, "reconstruction"),
            (reconstructed - original, "error")]):
        v0, v1 = (vmin, vmax) if name != "error" else (None, None)
        cmap = "jet" if name != "error" else "RdBu_r"
        im = _draw(ax, f, lat, lon, proj, cmap, v0, v1)
        ax.set_title(f"{title} {name}".strip())
        fig.colorbar(im, ax=ax, shrink=0.7)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def plot_forecast_panels(
    frames: np.ndarray,          # (T, lat, lon)
    lat: np.ndarray,
    lon: np.ndarray,
    lead_hours: Sequence[int],
    truth: Optional[np.ndarray] = None,
    title: str = "",
    out_path: Optional[str] = None,
):
    """Static multi-lead-time forecast panels (reference
    plot_traj_static, utils.py:697-935)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = 2 if truth is not None else 1
    n = len(lead_hours)
    fig, axes = plt.subplots(rows, n, figsize=(3.2 * n, 2.6 * rows),
                             squeeze=False)
    vmin = np.nanmin(frames)
    vmax = np.nanmax(frames)
    for j, lh in enumerate(lead_hours):
        im = axes[0][j].pcolormesh(lon, lat, frames[j], cmap="jet",
                                   vmin=vmin, vmax=vmax)
        axes[0][j].set_title(f"{title} +{lh}h")
        if truth is not None:
            axes[1][j].pcolormesh(lon, lat, truth[j], cmap="jet",
                                  vmin=vmin, vmax=vmax)
            axes[1][j].set_title(f"ERA5 +{lh}h")
    fig.colorbar(im, ax=[a for row in axes for a in row], shrink=0.6)
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def save_forecast_gif(
    frames: np.ndarray,  # (T, lat, lon)
    out_path: str,
    fps: int = 4,
    cmap: str = "jet",
):
    """Forecast animation (reference plot_traj_animation, utils.py:218-542)
    written as an animated GIF via matplotlib."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 3))
    vmin, vmax = np.nanmin(frames), np.nanmax(frames)
    im = ax.imshow(frames[0][::-1], cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_axis_off()

    def update(i):
        im.set_data(frames[i][::-1])
        return [im]

    ani = animation.FuncAnimation(fig, update, frames=len(frames))
    ani.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)


def to_rgb(field: np.ndarray, cmap: str = "jet") -> np.ndarray:
    """Field -> uint8 RGB via a colormap (reference convert_to_rgb,
    utils.py:77-105)."""
    import matplotlib.cm as cm

    f = np.asarray(field, np.float64)
    f = (f - np.nanmin(f)) / max(np.nanmax(f) - np.nanmin(f), 1e-12)
    rgba = cm.get_cmap(cmap)(f)
    return (rgba[..., :3] * 255).astype(np.uint8)
