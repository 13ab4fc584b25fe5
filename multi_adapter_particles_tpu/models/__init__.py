"""Particle models: state containers, initializers, force models, integrators."""
