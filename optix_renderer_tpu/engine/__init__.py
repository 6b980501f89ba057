"""Render orchestration: camera, frame function, renderer, CLI."""
