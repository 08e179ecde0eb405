"""Evaluation dataset registry (reference: test_video.py:18-161).

Paths are resolved against a configurable root so the same registry works
on any machine: ``<root>/<dataset_dir>/PNG_Frames/<sequence-with-x64-res>``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EvalDataset:
    dir: str
    frames: int = 96
    gop: int = 12
    org_resolution: str = ""
    x64_resolution: str = ""
    sequences: tuple = ()


TEST_DATA = {
    "HEVC_B": EvalDataset(
        dir="ClassB",
        org_resolution="1920x1080",
        x64_resolution="1920x1024",
        sequences=(
            "BasketballDrive_1920x1080_50",
            "BQTerrace_1920x1080_60",
            "Cactus_1920x1080_50",
            "Kimono1_1920x1080_24",
            "ParkScene_1920x1080_24",
        ),
    ),
    "HEVC_C": EvalDataset(
        dir="ClassC",
        org_resolution="832x480",
        x64_resolution="832x448",
        sequences=(
            "BasketballDrill_832x480_50",
            "BQMall_832x480_60",
            "PartyScene_832x480_50",
            "RaceHorses_832x480_30",
        ),
    ),
    "HEVC_D": EvalDataset(
        dir="ClassD",
        org_resolution="416x240",
        x64_resolution="384x192",
        sequences=(
            "BasketballPass_416x240_50",
            "BlowingBubbles_416x240_50",
            "BQSquare_416x240_60",
            "RaceHorses_416x240_30",
        ),
    ),
    "HEVC_E": EvalDataset(
        dir="ClassE",
        org_resolution="1280x720",
        x64_resolution="1280x704",
        sequences=(
            "FourPeople_1280x720_60",
            "Johnny_1280x720_60",
            "KristenAndSara_1280x720_60",
        ),
    ),
    "UVG": EvalDataset(
        dir="UVG",
        org_resolution="1920x1080",
        x64_resolution="1920x1024",
        sequences=(
            "Beauty_1920x1080_120fps_420_8bit_YUV",
            "Bosphorus_1920x1080_120fps_420_8bit_YUV",
            "HoneyBee_1920x1080_120fps_420_8bit_YUV",
            "Jockey_1920x1080_120fps_420_8bit_YUV",
            "ReadySteadyGo_1920x1080_120fps_420_8bit_YUV",
            "ShakeNDry_1920x1080_120fps_420_8bit_YUV",
            "YachtRide_1920x1080_120fps_420_8bit_YUV",
        ),
    ),
    "VTL": EvalDataset(
        dir="VTL",
        org_resolution="352x288",
        x64_resolution="352x288",
        sequences=(
            "akiyo_cif", "BigBuckBunny_CIF_24fps", "bridge-close_cif",
            "bridge-far_cif", "bus_cif", "coastguard_cif", "container_cif",
            "ElephantsDream_CIF_24fps", "flower_cif", "foreman_cif",
            "hall_cif", "highway_cif", "mobile_cif", "mother-daughter_cif",
            "news_cif", "paris_cif", "silent_cif", "stefan_cif",
            "tempete_cif", "waterfall_cif",
        ),
    ),
    "MCL-JCV": EvalDataset(
        dir="MCL-JCV",
        org_resolution="1920x1080",
        x64_resolution="1920x1024",
        sequences=tuple(
            f"videoSRC{i:02d}_1920x1080_{fps}"
            for i, fps in zip(
                range(1, 31),
                [30, 30, 30, 30, 25, 25, 25, 25, 25, 30, 30, 30, 30, 30, 30,
                 30, 24, 25, 30, 25, 24, 24, 24, 24, 24, 30, 30, 30, 24, 30],
            )
        ),
    ),
}
