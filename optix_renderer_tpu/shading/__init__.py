"""Shading: Frostbite GGX BSDF, material dispatch, LTC area-light integration."""
