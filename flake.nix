# Nix packaging parity with the reference (needle's flake.nix:1-88 provides a
# package + devshell pinning FFmpeg/chromaprint/FFTW). needle-tpu's native
# surface is smaller — only the FFmpeg libraries (the fingerprinter is
# reimplemented on JAX, no libchromaprint needed at runtime) — so the flake
# packages the Python library with its C++ ingest extension built in-tree.
#
# No nix binary exists in the development container, so this flake is
# validated structurally only (see README "Packaging"); `nix build` /
# `nix develop` are expected to work on any flakes-enabled Nix.
{
  description = "needle-tpu: TPU-native audio-fingerprint search for TV/anime openings and endings";

  inputs = {
    nixpkgs.url = "github:NixOS/nixpkgs/nixos-24.05";
    flake-utils.url = "github:numtide/flake-utils";
  };

  outputs = { self, nixpkgs, flake-utils }:
    flake-utils.lib.eachDefaultSystem (system:
      let
        pkgs = import nixpkgs { inherit system; };
        python = pkgs.python312;
        ffmpegLibs = pkgs.ffmpeg_6.dev;

        needle-tpu = python.pkgs.buildPythonPackage {
          pname = "needle-tpu";
          version = "0.1.0";
          pyproject = true;
          src = ./.;

          nativeBuildInputs = [
            pkgs.gnumake
            pkgs.gcc
            python.pkgs.setuptools
          ];
          buildInputs = [ ffmpegLibs ];
          propagatedBuildInputs = with python.pkgs; [
            numpy
            jax
            jaxlib
            scipy
          ];

          # build the native ingest extension and ship it inside the package
          preBuild = ''
            make -C native
            mkdir -p needle_tpu/_native
            cp native/libneedle_ingest.so needle_tpu/_native/
          '';

          nativeCheckInputs = [ python.pkgs.pytestCheckHook ];
          # hermetic CPU mesh, like tests/conftest.py
          preCheck = ''
            export JAX_PLATFORMS=cpu
            export XLA_FLAGS="--xla_force_host_platform_device_count=8"
          '';
        };
      in {
        packages.default = needle-tpu;

        devShells.default = pkgs.mkShell {
          packages = [
            (python.withPackages (ps: [ ps.numpy ps.jax ps.jaxlib ps.scipy ps.pytest ]))
            pkgs.gnumake
            pkgs.gcc
            ffmpegLibs
          ];
        };
      });
}
