"""System diagnostics at startup (C16, reference ``utils.py:5-70`` +
O1's data-dir audit ``BaseLineO1/utils.py:71-156``) — TPU edition."""

from __future__ import annotations

import os
import platform
from pathlib import Path


def format_file_size(num_bytes: float) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if num_bytes < 1024.0:
            return f"{num_bytes:.1f}{unit}"
        num_bytes /= 1024.0
    return f"{num_bytes:.1f}PB"


def print_system_info() -> dict:
    info = {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "cpu_count": os.cpu_count(),
    }
    try:
        import psutil

        vm = psutil.virtual_memory()
        info["memory_total"] = format_file_size(vm.total)
        info["memory_available"] = format_file_size(vm.available)
    except Exception:
        pass
    try:
        import jax

        info["jax_version"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["device_count"] = jax.device_count()
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception:
        pass
    for k, v in info.items():
        print(f"  {k}: {v}")
    return info


def parse_data_path_structure(data_path, max_depth: int = 2) -> str:
    """Directory tree + sizes report (O1 ``parse_data_path_structure``)."""
    lines = []
    root = Path(data_path)
    if not root.exists():
        return f"{data_path} (missing)"

    def walk(d: Path, depth: int):
        if depth > max_depth:
            return
        for p in sorted(d.iterdir()):
            indent = "  " * depth
            if p.is_dir():
                lines.append(f"{indent}{p.name}/")
                walk(p, depth + 1)
            else:
                lines.append(f"{indent}{p.name} "
                             f"({format_file_size(p.stat().st_size)})")

    lines.append(str(root))
    walk(root, 1)
    return "\n".join(lines)
