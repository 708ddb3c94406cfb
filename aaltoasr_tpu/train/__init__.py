"""Training engine: alignment, Baum-Welch E-step, ML/EBW M-step, adaptation."""
