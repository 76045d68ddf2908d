// Streaming IIR/FIR filter for host-side C++ consumers of the generated
// filter tables (utils/filtermaker.py -> ldd_filters.h).
//
// Capability equivalent of the reference's ld-decoder.h Filter class
// (ld-decoder.h:102-216), redesigned: direct-form II transposed with a
// single state vector (the reference keeps separate x/y histories in
// direct form I), which halves the state and is the numerically
// preferred realization for double-precision audio/video rates.

#pragma once

#include <cstddef>
#include <vector>

namespace ldd {

class StreamFilter {
  public:
    // b: numerator taps; a: denominator (a[0] must be 1; pass {1.0} for
    // a pure FIR).
    StreamFilter(std::vector<double> b, std::vector<double> a = {1.0})
        : b_(std::move(b)), a_(std::move(a)) {
        std::size_t n = b_.size() > a_.size() ? b_.size() : a_.size();
        if (n < 2) n = 2;
        b_.resize(n, 0.0);
        a_.resize(n, 0.0);
        z_.assign(n - 1, 0.0);
    }

    void reset(double value = 0.0) {
        for (auto &z : z_) z = value;
    }

    // One step of direct-form II transposed:
    //   y = b0*x + z0;  z_i = b_{i+1}*x - a_{i+1}*y + z_{i+1}
    double feed(double x) {
        const double y = b_[0] * x + z_[0];
        const std::size_t m = z_.size();
        for (std::size_t i = 0; i < m; ++i) {
            const double znext = (i + 1 < m) ? z_[i + 1] : 0.0;
            z_[i] = b_[i + 1] * x - a_[i + 1] * y + znext;
        }
        return y;
    }

    std::size_t order() const { return b_.size() - 1; }

  private:
    std::vector<double> b_, a_;
    std::vector<double> z_;
};

}  // namespace ldd
