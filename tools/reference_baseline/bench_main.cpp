// Baseline driver for the reference PL-StVO core: feeds a directory of
// pre-rectified stereo PNGs through StereoFrameHandler with the default
// (reference) configuration, reports per-frame wall time and writes the
// trajectory in KITTI format.  Mirrors app/imagesStVO.cpp:85-130 without
// the Boost/yaml-cpp dataset+config layers (unavailable in this image).
#include <chrono>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/core.hpp>
#include <stereoFrameHandler.h>
#include <pinholeStereoCamera.h>
#include <config.h>

using namespace StVO;

int main(int argc, char** argv) {
    if (argc < 9) {
        std::fprintf(stderr,
            "usage: %s dir_l dir_r n fx fy cx cy b [out_traj] [points_only]\n",
            argv[0]);
        return 1;
    }
    std::string dir_l = argv[1], dir_r = argv[2];
    int n = std::atoi(argv[3]);
    double fx = std::atof(argv[4]), fy = std::atof(argv[5]);
    double cx = std::atof(argv[6]), cy = std::atof(argv[7]);
    double b  = std::atof(argv[8]);
    std::string out_traj = argc > 9 ? argv[9] : "";
    if (argc > 10 && std::atoi(argv[10])) Config::hasLines() = false;

    cv::Mat img0 = cv::imread(dir_l + "/000000.png", cv::IMREAD_GRAYSCALE);
    if (img0.empty()) { std::fprintf(stderr, "no frames\n"); return 1; }
    PinholeStereoCamera* cam = new PinholeStereoCamera(
        img0.cols, img0.rows, fx, fy, cx, cy, b);
    StereoFrameHandler StVO(cam);

    std::vector<Matrix4d> traj;
    double total_ms = 0.0;
    int timed = 0;
    for (int i = 0; i < n; ++i) {
        char name[64];
        std::snprintf(name, sizeof name, "/%06d.png", i);
        cv::Mat il = cv::imread(dir_l + name, cv::IMREAD_GRAYSCALE);
        cv::Mat ir = cv::imread(dir_r + name, cv::IMREAD_GRAYSCALE);
        if (il.empty() || ir.empty()) break;
        if (i == 0) { StVO.initialize(il, ir, 0); traj.push_back(Matrix4d::Identity()); continue; }
        auto t0 = std::chrono::steady_clock::now();
        StVO.insertStereoPair(il, ir, i);
        StVO.optimizePose();
        auto t1 = std::chrono::steady_clock::now();
        double ms = std::chrono::duration<double, std::milli>(t1 - t0).count();
        if (i > 2) { total_ms += ms; timed++; }   // skip warmup frames
        traj.push_back(StVO.curr_frame->Tfw);
        std::printf("Frame %4d  res %10.6f  %7.2f ms  pt %zu(%d) ls %zu(%d)\n",
                    i, StVO.curr_frame->err_norm, ms,
                    StVO.matched_pt.size(), StVO.n_inliers_pt,
                    StVO.matched_ls.size(), StVO.n_inliers_ls);
        StVO.updateFrame();
    }
    if (timed)
        std::printf("MEAN_MS %.3f  FPS %.2f  FRAMES %d\n",
                    total_ms / timed, 1e3 * timed / total_ms, timed);
    if (!out_traj.empty()) {
        std::ofstream f(out_traj);
        for (const auto& T : traj) {
            for (int r = 0; r < 3; ++r)
                for (int c = 0; c < 4; ++c)
                    f << T(r, c) << (r == 2 && c == 3 ? "" : " ");
            f << "\n";
        }
    }
    return 0;
}
