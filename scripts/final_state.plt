# gnuplot script for the final velocity field — same plot as the reference's
# final_state.plt (x, y, |u| as an image).
set title 'Fluid Velocity'
set xlabel 'cell # along x-dimension'
set ylabel 'cell # along y-dimension'
set size ratio -1
set autoscale fix

set terminal png
set output 'final_state.png'

plot 'final_state.dat' using 1:2:5 with image
