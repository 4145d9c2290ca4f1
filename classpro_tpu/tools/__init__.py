"""Auxiliary tools: data simulation, ClassGS, prof2class, class2acc."""
