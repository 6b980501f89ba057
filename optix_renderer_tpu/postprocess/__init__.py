"""Post-processing: denoise, tonemap, image IO."""
