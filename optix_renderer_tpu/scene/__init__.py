"""Scene description, asset loading, and device scene construction (host side)."""
