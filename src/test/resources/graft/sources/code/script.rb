# frozen_string_literal: true
# GNU General Public License applies
puts 'hi'
