"""Authoring tools: media-JSON authoring (mat_parser) and the showcase
scene generator."""
