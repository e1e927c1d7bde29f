"""Directory helpers (role of reference src/utils.py:3-13)."""
import os


def check_create_dir(directory):
    """mkdir -p; returns the path (reference utils.py:3-13 contract)."""
    directory = str(directory)
    if not os.path.exists(directory):
        os.makedirs(directory, exist_ok=True)
        print(f"Created directory: {directory}")
    return directory
